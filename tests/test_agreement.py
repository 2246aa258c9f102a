"""E181 pair-counting agreement: hand-computable fixtures, identity /
independence properties of Rand+ARI, degenerate NULLs, symmetry of the
symmetric columns, and a numpy contingency reference."""

from __future__ import annotations

import itertools

import numpy as np
import pytest

from mediaduplicatefinder_spark.operators.agreement import (
    clustering_agreement,
)


def _df(spark, labels):
    return spark.createDataFrame(
        [(i, c) for i, c in labels], "item long, cluster long"
    )


def _ref(la, lb):
    """Pair-counting reference by brute-force pair enumeration."""
    common = sorted(set(la) & set(lb))
    both = sa = sb = 0
    for x, y in itertools.combinations(common, 2):
        a_same = la[x] == la[y]
        b_same = lb[x] == lb[y]
        both += a_same and b_same
        sa += a_same
        sb += b_same
    n = len(common)
    t = n * (n - 1) // 2
    out = {"pairs_both": both, "pairs_a": sa, "pairs_b": sb}
    out["rand_index"] = (t + 2 * both - sa - sb) / t if t else None
    den = t * (sa + sb) - 2 * sa * sb
    out["ari"] = (2 * (t * both - sa * sb)) / den if den else None
    return out


def _run(spark, la, lb):
    row = clustering_agreement(
        _df(spark, la.items()), _df(spark, lb.items())
    ).collect()[0]
    return row.asDict()


def test_identical_partitions(spark):
    la = {i: i % 3 for i in range(12)}
    got = _run(spark, la, la)
    assert got["ari"] == 1.0 and got["rand_index"] == 1.0
    assert got["pair_precision"] == got["pair_recall"] == 1.0
    assert got["pairs_both"] == got["pairs_a"] == got["pairs_b"]
    assert got["n_items"] == 12
    assert got["n_clusters_a"] == got["n_clusters_b"] == 3


def test_hand_fixture_and_reference(spark):
    rng = np.random.default_rng(3)
    la = {i: int(rng.integers(0, 4)) for i in range(40)}
    lb = {i: int(rng.integers(0, 5)) for i in range(40)}
    got = _run(spark, la, lb)
    ref = _ref(la, lb)
    for k in ("pairs_both", "pairs_a", "pairs_b"):
        assert got[k] == ref[k], k
    assert abs(got["rand_index"] - ref["rand_index"]) < 1e-9
    assert abs(got["ari"] - ref["ari"]) < 1e-9


def test_near_zero_ari_for_independent(spark):
    # balanced independent labelings: expected ARI ~ 0 (Hubert-Arabie's
    # whole point); generous band since n is small
    rng = np.random.default_rng(11)
    la = {i: int(rng.integers(0, 5)) for i in range(600)}
    lb = {i: int(rng.integers(0, 5)) for i in range(600)}
    got = _run(spark, la, lb)
    assert abs(got["ari"]) < 0.05
    # Rand is NOT corrected for chance — stays high for many clusters
    assert got["rand_index"] > 0.5


def test_degenerate_nulls(spark):
    # both all-singletons: ARI denominator 0 -> NULL; rand = 1
    la = {i: i for i in range(8)}
    got = _run(spark, la, la)
    assert got["ari"] is None
    assert got["rand_index"] == 1.0
    assert got["pair_precision"] is None  # 0/0 pair ratios
    # n=1: T=0 -> rand NULL too
    got = _run(spark, {1: 0}, {1: 0})
    assert got["rand_index"] is None and got["ari"] is None


def test_inner_join_scope(spark):
    # items only in one labeling are excluded from the contingency
    la = {i: 0 for i in range(6)}
    lb = {i: 0 for i in range(3, 9)}
    got = _run(spark, la, lb)
    assert got["n_items"] == 3
    assert got["pairs_both"] == 3  # C(3,2)


def test_refinement_recall_one(spark):
    # B refines A (splits one A-cluster): every B-pair is an A-pair ->
    # precision(B vs A) = 1, recall < 1
    la = {i: i // 6 for i in range(12)}  # two clusters of 6
    lb = {i: i // 3 for i in range(12)}  # four clusters of 3
    got = _run(spark, la, lb)
    assert got["pair_precision"] == 1.0
    assert got["pair_recall"] < 1.0
    assert got["pairs_both"] == got["pairs_b"]


def test_empty_colabeled_universe_zero_not_null(spark):
    # review r5: disjoint item keys -> zero-row join; counts must be
    # 0 (the twin's coalesce), never NULL
    a = spark.createDataFrame([("x", 1)], "item string, cluster long")
    b = spark.createDataFrame([("y", 1)], "item string, cluster long")
    r = clustering_agreement(a, b).collect()[0]
    assert r["n_items"] == 0
    assert r["pairs_both"] == 0 and r["pairs_a"] == 0 and r["pairs_b"] == 0
