"""Triangle support per similarity edge (operators/cohesion.py
edge_triangle_support, E168) — hand-built chain/triangle/clique/bowtie
graphs, the min_support gate, partition invariance."""

from __future__ import annotations

import itertools

from mediaduplicatefinder_spark.operators.cohesion import edge_triangle_support


def _edges_df(spark, pairs):
    rows = [(a, b, 1.0) for a, b in pairs]
    return spark.createDataFrame(
        rows, "url_a string, url_b string, score double"
    )


def _ref(pairs):
    nbrs = {}
    for a, b in pairs:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    return {
        (a, b): (
            len(nbrs[a]),
            len(nbrs[b]),
            len(nbrs[a] & nbrs[b]),
        )
        for a, b in pairs
    }


def _run(spark, pairs, min_support=0):
    got = edge_triangle_support(
        _edges_df(spark, pairs), min_support=min_support
    ).collect()
    return {(r.url_a, r.url_b): (r.deg_a, r.deg_b, r.support) for r in got}


def test_chain_edges_have_zero_support(spark):
    pairs = [("a", "b"), ("b", "c"), ("c", "d")]
    got = _run(spark, pairs)
    assert got == _ref(pairs)
    assert all(s == 0 for (_, _, s) in got.values())


def test_triangle_and_clique(spark):
    tri = [("a", "b"), ("b", "c"), ("a", "c")]
    got = _run(spark, tri)
    assert got == _ref(tri)
    assert all(s == 1 for (_, _, s) in got.values())
    clique = list(itertools.combinations(["u", "v", "w", "x", "y"], 2))
    got = _run(spark, clique)
    assert got == _ref(clique)
    assert all(s == 3 for (_, _, s) in got.values())  # n-2 common


def test_bowtie_bridge_detected(spark):
    """Two triangles joined by one bridge edge: every triangle edge has
    support >= 1, the bridge has support 0 — the chain-bridge signal
    that breaks single-linkage chaining when gated on."""
    pairs = [
        ("a", "b"), ("b", "c"), ("a", "c"),  # left triangle
        ("x", "y"), ("y", "z"), ("x", "z"),  # right triangle
        ("c", "x"),                          # bridge
    ]
    got = _run(spark, pairs)
    assert got == _ref(pairs)
    assert got[("c", "x")][2] == 0
    assert all(
        s >= 1 for e, (_, _, s) in got.items() if e != ("c", "x")
    )
    # the gate drops exactly the bridge
    gated = _run(spark, pairs, min_support=1)
    assert set(gated) == set(got) - {("c", "x")}


def test_shared_hub_counts_once(spark):
    # a-b plus both connected to hubs h1,h2 -> support 2, degrees 3
    pairs = [("a", "b"), ("a", "h1"), ("b", "h1"), ("a", "h2"), ("b", "h2")]
    got = _run(spark, pairs)
    assert got[("a", "b")] == (3, 3, 2)


def test_partition_invariance(spark):
    pairs = [(f"n{i}", f"n{(i * 7 + 3) % 20}") for i in range(40)]
    pairs = sorted({(min(a, b), max(a, b)) for a, b in pairs if a != b})
    base = _run(spark, pairs)
    got = {
        (r.url_a, r.url_b): (r.deg_a, r.deg_b, r.support)
        for r in edge_triangle_support(
            _edges_df(spark, pairs).repartition(9)
        ).collect()
    }
    assert base == got == _ref(pairs)
