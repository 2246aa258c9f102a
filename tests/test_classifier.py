"""E64 hashed-feature linear quality classifier
(functions/classifier.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mediaduplicatefinder_spark.functions.classifier import (
    HASH_BUCKETS,
    quality_classifier,
)


def _run(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {r.doc_id: r for r in quality_classifier(df).collect()}


def _weight(spark, word):
    key = f"ft:{word:<13.13}"
    return (
        spark.range(1)
        .select(
            (F.pmod(F.xxhash64(F.lit(key)), F.lit(HASH_BUCKETS)) - 1024)
            .alias("w")
        )
        .collect()[0]
        .w
    )


def test_score_is_sum_of_word_weights(spark):
    out = _run(spark, ["alpha beta alpha"])
    r = out[0]
    wa, wb = _weight(spark, "alpha"), _weight(spark, "beta")
    assert r.n_words == 3
    assert r.score_int == 2 * wa + wb
    assert abs(r.score - (2 * wa + wb) / (3 * 1024.0)) < 1e-9
    assert r.keep == (r.score_int >= 0)


def test_tokenization_lowercase_ascii_runs(spark):
    # case-folding and punctuation splits: "Al-pha!" -> [al, pha]
    a = _run(spark, ["Al-pha!"])[0]
    b = _run(spark, ["al pha"])[0]
    assert (a.n_words, a.score_int) == (2, b.score_int)


def test_truncation_buckets_collide(spark):
    # the hashing trick: words sharing a 13-char prefix share a bucket
    w1 = "abcdefghijklmNOPE".lower()
    w2 = "abcdefghijklmYEP".lower()
    out = _run(spark, [w1, w2])
    assert out[0].score_int == out[1].score_int


def test_empty_and_nonascii_only(spark):
    out = _run(spark, ["", "   ", "!!!", "你好世界"])
    for r in out.values():
        assert r.n_words == 0 and r.score_int == 0
        assert r.score == 0.0 and r.keep  # 0 >= 0: neutral docs keep


def test_map_only_plan(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    plan = (
        quality_classifier(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # no shuffle: pure projection
