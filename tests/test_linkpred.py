"""RA link prediction (operators/linkpred.py, Zhou/Lü/Zhang'09):
hand-computed indices, hub penalty, edge exclusion."""

from __future__ import annotations

from mediaduplicatefinder_spark.operators.linkpred import (
    RA_SCALE,
    ra_link_pairs,
)


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b) for a, b in pairs], "url_a string, url_b string"
    )


def _collect(df):
    return {
        (r["url_a"], r["url_b"]): (r["n_common"], r["ra_scaled"])
        for r in df.collect()
    }


def test_path_and_exclusive_middle(spark):
    # path a-b-c: b has degree 2 -> RA(a,c) = floor(1e6/2), 1 common
    got = _collect(
        ra_link_pairs(_edges(spark, [("a", "b"), ("b", "c")]), min_common=1)
    )
    assert got == {("a", "c"): (1, RA_SCALE // 2)}


def test_hub_contributes_less_than_exclusive_neighbor(spark):
    # x and y share TWO middles: exclusive m (deg 2) and hub h (deg 5)
    pairs = [
        ("m", "x"), ("m", "y"),
        ("h", "x"), ("h", "y"), ("h", "p"), ("h", "q"), ("h", "r"),
    ]
    got = _collect(ra_link_pairs(_edges(spark, pairs), min_common=2))
    n, ra = got[("x", "y")]
    assert n == 2
    assert ra == RA_SCALE // 2 + RA_SCALE // 5  # exclusive >> hub share


def test_existing_edges_excluded(spark):
    # triangle a-b-c plus chain: the existing edges never reappear
    pairs = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "d")]
    got = _collect(ra_link_pairs(_edges(spark, pairs), min_common=1))
    assert ("a", "b") not in got and ("a", "c") not in got
    # a-d and b-d share middle c (deg 3)
    assert got[("a", "d")] == (1, RA_SCALE // 3)
    assert got[("b", "d")] == (1, RA_SCALE // 3)


def test_min_common_gate(spark):
    got = _collect(
        ra_link_pairs(_edges(spark, [("a", "b"), ("b", "c")]), min_common=2)
    )
    assert got == {}  # single shared neighbor filtered
