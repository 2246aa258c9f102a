"""E35 bounded suffix array: full parity with a brute-force Python
reference (sorted md5-keyed suffixes + token-by-token LCP), plus the
distributed-dense-rank primitive, partition invariance, and plan-shape
probes (no single-reducer global window, no token arrays below the
pair joins)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from mediaduplicatefinder_spark.operators.suffixarray import (
    CAP,
    distributed_dense_rank,
    suffix_dup_spans,
    suffix_ranks,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog and runs far away "
        "into the deep dark forest tonight"),
    (2, "some filler words then the quick brown fox jumps over the lazy "
        "dog and runs far away into town"),
    (3, "completely unrelated text about cooking pasta with tomato sauce "
        "and fresh basil leaves"),
    (4, "the quick brown fox jumps over the lazy dog and runs far away "
        "into the deep dark forest tonight"),  # exact dup of 1
    (5, ""),
]


def _toks(t):
    return [w for w in t.lower().strip().split() if w]


def _ref(docs, min_match):
    """Brute-force bounded SA + adjacent LCP."""
    suf = []
    for did, t in docs:
        ts = _toks(t)
        for p in range(len(ts)):
            key = tuple(
                hashlib.md5(w.encode()).hexdigest() for w in ts[p : p + CAP]
            )
            suf.append((key, did, p, len(ts)))
    suf.sort()
    out = {}
    txt = dict(docs)
    for i in range(1, len(suf)):
        (_, da, pa, la), (_, db, pb, lb) = suf[i - 1], suf[i]
        ta, tb = _toks(txt[da]), _toks(txt[db])
        l = 0
        while l < CAP and pa + l < la and pb + l < lb and ta[pa + l] == tb[pb + l]:
            l += 1
        if l >= min_match:
            out[(db, pb)] = (i + 1, da, pa, l)
    return out


def test_suffix_dup_spans_matches_brute_force(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {
        (r["doc_id"], r["pos"]): (
            r["sa_rank"], r["prev_doc"], r["prev_pos"], r["match_len"]
        )
        for r in suffix_dup_spans(df, min_match=5).collect()
    }
    assert got == _ref(DOCS, 5)


def test_suffix_ranks_is_a_permutation(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rows = suffix_ranks(df).collect()
    n = sum(len(_toks(t)) for _, t in DOCS)
    assert sorted(r["sa_rank"] for r in rows) == list(range(1, n + 1))


def test_suffix_dup_spans_partition_invariant(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    a = sorted(map(tuple, suffix_dup_spans(df, min_match=5).collect()))
    b = sorted(
        map(tuple, suffix_dup_spans(df.repartition(9), min_match=5).collect())
    )
    assert a == b


def test_distributed_dense_rank_matches_naive(spark):
    df = spark.createDataFrame(
        [(x,) for x in [5, 3, 3, 9, 1, 5, 5, 7]], "v long"
    ).repartition(5)
    got = {
        (r["v"], r["rk"])
        for r in distributed_dense_rank(df, F.col("v"), "rk").collect()
    }
    assert got == {(1, 1), (3, 2), (5, 3), (7, 4), (9, 5)}


def test_distributed_dense_rank_has_no_global_window(spark):
    df = spark.createDataFrame([(x,) for x in range(100)], "v long")
    plan = (
        distributed_dense_rank(df, F.col("v"), "rk")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # per-partition row_number windows partition by spark_partition_id;
    # a SinglePartition exchange feeding a Window would be the
    # single-reducer anti-pattern this primitive exists to avoid
    import re

    for m in re.finditer(r"Exchange SinglePartition[^\n]*\n([^\n]*)", plan):
        assert "Window" not in m.group(1)


def test_suffix_pair_joins_carry_no_token_arrays(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = (
        suffix_dup_spans(df, min_match=5)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # tokens exist only in the rank tables' lineage (checkpointed);
    # the LCP walk joins compact (doc, pos, rank) rows
    assert "CartesianProduct" not in plan


def test_frontier_compression_shrinks_checkpoint_volume(spark):
    """Round-4 rewrite evidence: each doubling round checkpoints only
    the ACTIVE frontier (rank groups of size >= 2), so total
    checkpointed rows are far below the old full-table-per-round shape
    (rounds x corpus)."""
    from mediaduplicatefinder_spark.operators.suffixarray import (
        _suffix_levels,
    )

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    final, levels, pos_base, frontiers = _suffix_levels(df)
    n = sum(len(_toks(t)) for _, t in DOCS)
    sizes = [c for _, c in frontiers]
    # frontiers never grow, and resolution actually happens
    assert sizes == sorted(sizes, reverse=True)
    assert sizes[0] <= n and sizes[-1] < n
    # exact-dup docs (1 and 4) share every suffix full-length: those
    # positions can never resolve, so the floor is 2 * len(doc 1)
    floor = 2 * len(_toks(DOCS[0][1]))
    assert sizes[-1] >= floor
    # total checkpoint volume (initial labeling + per-round frontiers)
    # strictly below the old shape's (1 + rounds) full materializations
    assert n + sum(sizes) < (1 + len(sizes)) * n
    # level tables each cover every position exactly once
    for m, t in levels.items():
        assert t.count() == n, m
        assert t.select("gpos").distinct().count() == n, m
