"""Priority sampling (operators/prioritysample.py, Duffield/Lund/
Thorup JACM'07): determinism, scale invariance, estimator term,
small-group tau fallback."""

from __future__ import annotations

from pyspark.sql import functions as F

from mediaduplicatefinder_spark.operators.prioritysample import (
    priority_sample,
)


def _docs_df(spark, n=40):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("de").alias("lang"),
        (F.lit(1.0) + (F.col("id") % 7).cast("double")).alias("w"),
    )


def _sample(df, k=5, scale=1.0):
    return priority_sample(
        df,
        weight=F.col("w") * F.lit(scale),
        key=F.format_string("doc://%010d", F.col("doc_id")),
        group_cols=("lang",),
        id_cols=("doc_id",),
        k=k,
    )


def test_deterministic_and_bounded(spark):
    df = _docs_df(spark)
    r1 = sorted(map(tuple, _sample(df).collect()))
    r2 = sorted(map(tuple, _sample(df).collect()))
    assert r1 == r2
    per_group = {}
    for row in r1:
        per_group.setdefault(row[0], []).append(row)
    assert set(per_group) == {"en", "de"}
    assert all(len(v) == 5 for v in per_group.values())


def test_scale_invariant_sample_set(spark):
    # q = w/u: scaling every weight scales every priority equally, so
    # the SELECTED SET is invariant (the estimator values change)
    df = _docs_df(spark)
    s1 = {(r["lang"], r["doc_id"]) for r in _sample(df).collect()}
    s2 = {(r["lang"], r["doc_id"]) for r in _sample(df, scale=7.0).collect()}
    assert s1 == s2


def test_estimator_term_lower_bounded_by_weight(spark):
    for row in _sample(_docs_df(spark)).collect():
        assert row["w_hat"] >= row["weight"]


def test_group_smaller_than_k_keeps_all_with_w_hat_eq_weight(spark):
    df = _docs_df(spark, n=6)  # 3 per lang < k+1
    rows = _sample(df, k=5).collect()
    assert len(rows) == 6  # everything kept
    for row in rows:
        assert row["w_hat"] == row["weight"]  # tau absent -> max(w, 0)


def test_heavier_items_win_given_equal_hash_budget(spark):
    # one item with overwhelming weight must always be in the sample
    df = _docs_df(spark).withColumn(
        "w", F.when(F.col("doc_id") == 8, 1e9).otherwise(F.col("w"))
    )
    sampled = {
        r["doc_id"] for r in _sample(df).collect() if r["lang"] == "en"
    }
    assert 8 in sampled
