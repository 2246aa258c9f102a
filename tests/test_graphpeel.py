"""k-core / k-truss peeling (operators/kcore.py) and synchronous LPA
(operators/lpa.py) against hand-computed graphs, plus HITS fixed-point
properties (operators/linkgraph.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mediaduplicatefinder_spark.operators.kcore import kcore_peel, ktruss_peel
from mediaduplicatefinder_spark.operators.lpa import lpa_communities


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(a, b, 1.0) for a, b in pairs], "url_a string, url_b string, score double"
    )


# K4 clique a-d, a chain e-f-g hanging off d, and an isolated pair x-y
K4 = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d"), ("c", "d")]
CHAIN = [("d", "e"), ("e", "f"), ("f", "g")]
PAIR = [("x", "y")]
GRAPH = K4 + CHAIN + PAIR


def test_kcore_fixpoint_extracts_clique(spark):
    out = kcore_peel(_edges(spark, GRAPH), k=3).collect()
    got = {(r["url"], r["core_deg"]) for r in out}
    # the 3-core is exactly the K4; every member keeps degree 3 inside it
    assert got == {("a", 3), ("b", 3), ("c", 3), ("d", 3)}


def test_kcore_k2_keeps_clique_only(spark):
    # chain tails peel one per round under k=2; x-y peels immediately
    out = kcore_peel(_edges(spark, GRAPH), k=2).collect()
    assert {r["url"] for r in out} == {"a", "b", "c", "d"}


def test_kcore_rounds_mode_matches_prefix_of_peel(spark):
    # round 1 under k=2: g (deg 1) and x,y (deg 1) drop, rest stay
    out = kcore_peel(_edges(spark, GRAPH), k=2, rounds=1).collect()
    assert {r["url"] for r in out} == {"a", "b", "c", "d", "e", "f"}
    # round-R state converges to the fixpoint for R large enough
    fix = {
        (r["url"], r["core_deg"])
        for r in kcore_peel(_edges(spark, GRAPH), k=2, rounds=6).collect()
    }
    ref = {
        (r["url"], r["core_deg"])
        for r in kcore_peel(_edges(spark, GRAPH), k=2).collect()
    }
    assert fix == ref


def test_ktruss_fixpoint(spark):
    # 4-truss (every edge in >= 2 triangles) of GRAPH is exactly the K4
    out = ktruss_peel(_edges(spark, GRAPH), k=4).collect()
    got = {(r["url_a"], r["url_b"], r["support"]) for r in out}
    assert got == {(a, b, 2) for a, b in K4}


def test_ktruss_3truss_keeps_triangles(spark):
    # add one triangle t1-t2-t3; 3-truss keeps K4 + triangle, drops chain
    tri = [("t1", "t2"), ("t1", "t3"), ("t2", "t3")]
    out = ktruss_peel(_edges(spark, GRAPH + tri), k=3).collect()
    got = {(r["url_a"], r["url_b"]) for r in out}
    assert got == set(K4) | set(tri)


def test_lpa_bridge_splits_communities(spark):
    # two K4s joined by a single bridge edge: CC gives ONE component,
    # LPA at fixpoint keeps TWO label communities (the seam holds)
    k4b = [(a.upper(), b.upper()) for a, b in K4]
    bridge = [("d", "A")]
    out = lpa_communities(_edges(spark, K4 + k4b + bridge)).collect()
    comm = {r["url"]: r["community"] for r in out}
    left = {comm[u] for u in "abcd"}
    right = {comm[u] for u in "ABCD"}
    assert len(left) == 1 and len(right) == 1
    assert left != right
    sizes = {r["url"]: r["n_members"] for r in out}
    assert sizes["a"] == 4 and sizes["A"] == 4


def test_lpa_unrolled_matches_fixpoint_on_stable_graph(spark):
    rolled = lpa_communities(_edges(spark, K4 + PAIR), rounds=4).collect()
    fixed = lpa_communities(_edges(spark, K4 + PAIR)).collect()
    assert sorted(map(tuple, rolled)) == sorted(map(tuple, fixed))
    # min-label tie-break: the K4 converges to min url 'a'
    comm = {r["url"]: r["community"] for r in rolled}
    assert comm["a"] == comm["b"] == comm["c"] == comm["d"] == "a"
    assert comm["x"] == comm["y"] == "x"


def test_hits_hub_authority_separation(spark):
    from mediaduplicatefinder_spark.operators.linkgraph import hits_fixed

    # hub h points at authorities p,q,r; a second weaker hub g -> p
    edges = spark.createDataFrame(
        [("h", "p"), ("h", "q"), ("h", "r"), ("g", "p")],
        "src string, dst string",
    )
    rows = {r["host"]: r for r in hits_fixed(edges).collect()}
    # max-norm: the best hub and best authority sit at exactly SCALE
    assert rows["h"]["hub_scaled"] == 10**6
    assert rows["p"]["auth_scaled"] == 10**6
    # pure authorities have hub 0; pure hubs have auth 0
    assert rows["p"]["hub_scaled"] == 0 and rows["h"]["auth_scaled"] == 0
    # p (two inlinks) outranks q/r (one inlink from the same hub)
    assert rows["p"]["auth_scaled"] > rows["q"]["auth_scaled"] > 0
    assert rows["q"]["auth_scaled"] == rows["r"]["auth_scaled"]
    # h (3 outlinks incl. the top authority) outranks g
    assert rows["h"]["hub_scaled"] > rows["g"]["hub_scaled"] > 0
    # degree columns carried like pagerank's
    assert rows["h"]["od"] == 3 and rows["p"]["indeg"] == 2


def test_trustrank_flows_from_seeds_only(spark):
    from mediaduplicatefinder_spark.operators.linkgraph import (
        trustrank_fixed,
    )

    # s -> a -> b chain; spam ring x <-> y linked only from x's side
    edges = spark.createDataFrame(
        [("s", "a"), ("a", "b"), ("x", "y"), ("y", "x")],
        "src string, dst string",
    )
    seeds = spark.createDataFrame([("s",)], "host string")
    rows = {r["host"]: r for r in trustrank_fixed(edges, seeds).collect()}
    # trust decays along the chain but stays positive
    assert rows["s"]["tr_scaled"] > rows["a"]["tr_scaled"] > rows["b"][
        "tr_scaled"
    ] > 0
    # the unseeded ring gets exactly zero trust despite dense interlinks
    assert rows["x"]["tr_scaled"] == 0 and rows["y"]["tr_scaled"] == 0
    assert rows["s"]["is_seed"] and not rows["x"]["is_seed"]


def test_partition_invariance(spark):
    # north-rule determinism: identical outputs at any parallelism
    from mediaduplicatefinder_spark.operators.linkgraph import hits_fixed

    e = _edges(spark, GRAPH)
    for build in (
        lambda d: kcore_peel(d, k=2),
        lambda d: ktruss_peel(d, k=3),
        lambda d: lpa_communities(d, rounds=3),
    ):
        one = sorted(map(tuple, build(e.coalesce(1)).collect()))
        many = sorted(map(tuple, build(e.repartition(7)).collect()))
        assert one == many
    le = spark.createDataFrame(
        [("h", "p"), ("h", "q"), ("g", "p")], "src string, dst string"
    )
    assert sorted(map(tuple, hits_fixed(le.coalesce(1)).collect())) == sorted(
        map(tuple, hits_fixed(le.repartition(5)).collect())
    )


def test_kcore_empty_edges(spark):
    e = _edges(spark, []).limit(0)
    assert kcore_peel(e, k=2).count() == 0
    assert lpa_communities(e, rounds=2).count() == 0


def test_nonconvergence_raises_not_silent_superset(spark):
    # review r5: a chain graph peels O(n) rounds; exhausting
    # max_rounds must raise, not return a non-core superset
    chain = spark.createDataFrame(
        [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(60)],
        "url_a string, url_b string",
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        kcore_peel(chain, k=2, rounds=None, max_rounds=5)
    # ...and with enough rounds the true (empty) 2-core comes back
    assert kcore_peel(chain, k=2, rounds=None, max_rounds=60).count() == 0
