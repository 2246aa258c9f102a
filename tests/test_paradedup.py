"""E40 CCNet paragraph dedup: normalized keep-first-occurrence
semantics, the always-keep rule for empty-normalized lines, exact
reassembly, no-op on unique corpora, and partition invariance."""

from __future__ import annotations

from pyspark.sql import functions as F

from mediaduplicatefinder_spark.operators.paradedup import (
    normalize_paragraph_expr,
    paragraph_dedup,
)

DOCS = [
    # doc 1: body + footer; its footer copy is the corpus-first
    (1, "alpha beta gamma\nAll Rights Reserved 2024\n..."),
    # doc 2: same footer, different case AND year -> must still collide
    (2, "delta epsilon zeta\nall rights reserved 2031\n..."),
    # doc 3: within-doc duplicate line (second copy dropped) + footer
    (3, "eta theta iota\neta theta iota\nALL rights RESERVED 1999\n..."),
    # doc 4: unique content only
    (4, "kappa lambda mu\nnu xi omicron"),
]


def _out(spark, docs):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    return {r["doc_id"]: r for r in paragraph_dedup(df).collect()}


def test_keep_first_across_docs_after_normalization(spark):
    out = _out(spark, DOCS)
    # doc 1 holds the min (doc_id, line_idx) for the footer key: kept
    assert out[1]["text_deduped"] == "alpha beta gamma\nAll Rights Reserved 2024\n..."
    assert out[1]["n_dropped"] == 0
    # docs 2/3 lose their case/year variants of the same normalized key
    assert out[2]["text_deduped"] == "delta epsilon zeta\n..."
    assert out[2]["n_dropped"] == 1


def test_within_doc_duplicate_line_dropped(spark):
    out = _out(spark, DOCS)
    # second "eta theta iota" AND the footer variant both drop
    assert out[3]["text_deduped"] == "eta theta iota\n..."
    assert out[3]["n_dropped"] == 2
    assert out[3]["n_lines"] == 4


def test_empty_normalized_lines_always_kept(spark):
    out = _out(spark, DOCS)
    # "..." normalizes to '' and appears in docs 1-3; every copy stays
    for d in (1, 2, 3):
        assert out[d]["text_deduped"].endswith("...")


def test_unique_corpus_is_a_noop(spark):
    docs = [(1, "one two three\nfour five"), (2, "six seven\neight nine")]
    out = _out(spark, docs)
    for doc_id, text in docs:
        assert out[doc_id]["text_deduped"] == text
        assert out[doc_id]["n_dropped"] == 0


def test_normalization_expr(spark):
    df = spark.createDataFrame(
        [("  Hello,  WORLD 42!\t",)], "s string"
    ).select(normalize_paragraph_expr(F.col("s")).alias("n"))
    # tab survives the space-only collapse class but trims at the edge
    assert df.collect()[0]["n"] == "hello world 00"


def test_partition_invariance(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    a = sorted(map(tuple, paragraph_dedup(df.repartition(1)).collect()))
    b = sorted(map(tuple, paragraph_dedup(df.repartition(7)).collect()))
    assert a == b


def test_plan_no_cartesian_no_global_window(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = paragraph_dedup(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "Window" not in plan  # winner agg is min(struct), not a window
