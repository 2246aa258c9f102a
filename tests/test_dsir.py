"""E32 DSIR importance-resampling semantics on hand-built corpora.

The driver's DuckDB oracle proves engine-vs-SQL agreement; these tests
pin the *intended* behavior: target-like docs score above
background-like docs, the selection flag is the above-mean half of the
Gumbel-perturbed score, results are partition-invariant, and the plan
stays broadcast-only (no shuffle join, no window).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mediaduplicatefinder_spark.operators.dsir import (
    TARGET_MOD,
    dsir_weights,
)


def _corpus(spark):
    # target slice = doc_id % 37 == 0 -> docs 0, 37, 74, ... use a
    # distinctive vocabulary ("quantum flux..."); background docs use a
    # disjoint one. A held-out TEST doc (id 5, not in the target slice)
    # written in target vocabulary must out-score background docs.
    target_text = "quantum flux lattice boson entangle photon decay"
    bg_text = "cheap deals online casino click subscribe buy now"
    rows = []
    for i in range(0, 37 * 8, 37):
        rows.append((i, target_text))
    for i in (1, 2, 3, 4, 40, 41, 42, 43, 80, 81):
        rows.append((i, bg_text))
    rows.append((5, target_text))  # held-out target-like doc
    rows.append((6, ""))  # empty doc: n_grams = 0
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_dsir_target_like_scores_higher(spark):
    out = {
        r["doc_id"]: r for r in dsir_weights(_corpus(spark)).collect()
    }
    held_out = out[5]
    bg = [out[i] for i in (1, 2, 3, 4, 40, 41, 42, 43, 80, 81)]
    assert all(held_out["logw"] > b["logw"] for b in bg)
    # target-vocab docs are selected, background docs are not (the
    # corpus is majority-target so the mean sits between the two modes)
    assert held_out["selected"]
    assert not any(b["selected"] for b in bg)
    # empty doc: zero grams, logw exactly 0, still scored via gumbel
    assert out[6]["n_grams"] == 0 and out[6]["logw"] == 0.0


def test_dsir_selected_is_above_mean_half(spark):
    rows = dsir_weights(_corpus(spark)).collect()
    n = len(rows)
    mean = sum(r["score"] for r in rows) / n
    for r in rows:
        # score is the rounded-decimal double; compare with slack well
        # below the 1e-8 decimal grid
        if r["score"] > mean + 1e-9:
            assert r["selected"], r
        elif r["score"] < mean - 1e-9:
            assert not r["selected"], r


def test_dsir_partition_invariant(spark):
    docs = _corpus(spark)
    a = sorted(map(tuple, dsir_weights(docs).collect()))
    b = sorted(map(tuple, dsir_weights(docs.repartition(11)).collect()))
    assert a == b


def test_dsir_gumbel_is_per_doc_deterministic(spark):
    docs = _corpus(spark)
    g1 = {r["doc_id"]: r["gumbel"] for r in dsir_weights(docs).collect()}
    g2 = {
        r["doc_id"]: r["gumbel"]
        for r in dsir_weights(docs.limit(5)).collect()
    }
    for k in g2:  # same doc -> same noise regardless of corpus subset
        assert g1[k] == g2[k]


def test_dsir_plan_is_broadcast_only(spark):
    plan = (
        dsir_weights(_corpus(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # ratio table and stats row reach the docs via broadcast; the only
    # exchanges are the two tiny-keyed aggs — no sort-merge pair join,
    # no global window
    assert "SortMergeJoin" not in plan
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_dsir_target_mod_is_a_multiple_guard():
    # pin the slice definition the oracle builds into its SQL
    assert TARGET_MOD == 37
