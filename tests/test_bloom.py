"""E34 Bloom-filter membership probe: the no-false-negative guarantee,
exact-duplicate detection through the filter, word-table compactness,
and a broadcast-only probe plan (the history table must not be joined
by the probe path)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mediaduplicatefinder_spark.operators.bloom import (
    M_BITS,
    bloom_probe,
    bloom_words,
)


def _corpus(spark):
    # doc 10 duplicates history doc 3's text byte-for-byte; doc 20 is
    # probe-only and unique; ids % 10 == 0 are held OUT of history.
    rows = [(i, f"history document number {i} body text") for i in range(1, 10)]
    rows += [(i, f"history document number {i} body text") for i in range(11, 19)]
    rows.append((10, "history document number 3 body text"))
    rows.append((20, "a wholly new never-crawled page"))
    rows.append((30, ""))  # empty text still hashes deterministically
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bloom_no_false_negatives_and_exact_dup_found(spark):
    out = {r["doc_id"]: r for r in bloom_probe(_corpus(spark)).collect()}
    # Bloom guarantee: seen => maybe_seen, for every doc
    for r in out.values():
        assert (not r["seen"]) or r["maybe_seen"], r
    # every history doc probes its own key: maybe_seen and seen
    for i in list(range(1, 10)) + list(range(11, 19)):
        assert out[i]["seen"] and out[i]["maybe_seen"]
    # doc 10 is NOT in history but its text is doc 3's: a true match
    assert out[10]["seen"] and out[10]["maybe_seen"] and not out[10]["is_fp"]
    # is_fp is exactly maybe_seen minus seen
    for r in out.values():
        assert r["is_fp"] == (r["maybe_seen"] and not r["seen"])


def test_bloom_word_table_is_compact_and_32bit(spark):
    hist = (
        _corpus(spark)
        .filter("doc_id % 10 != 0")
        .select(F.sha2("text", 256).alias("sha"))
    )
    words = bloom_words(hist).collect()
    assert len(words) <= M_BITS // 32
    for r in words:
        assert 0 <= r["word_idx"] < M_BITS // 32
        assert 0 < r["word"] < (1 << 32)  # 32-bit words, always positive


def test_bloom_partition_invariant(spark):
    docs = _corpus(spark)
    a = sorted(map(tuple, bloom_probe(docs).collect()))
    b = sorted(map(tuple, bloom_probe(docs.repartition(7)).collect()))
    assert a == b


def test_bloom_probe_plan_is_broadcast_only(spark):
    plan = (
        bloom_probe(_corpus(spark))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan
