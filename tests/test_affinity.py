"""Affinity clustering (operators/affinity.py): Borůvka rounds on
hand-weighted graphs, hierarchy behavior, fixpoint == CC."""

from __future__ import annotations

from mediaduplicatefinder_spark.operators.affinity import affinity_clusters


def _edges(spark, triples):
    return spark.createDataFrame(
        triples, "url_a string, url_b string, score double"
    )


def test_round1_merges_best_edges_only(spark):
    # path a-b (0.9), b-c (0.8), c-d (0.95): a<->b mutual best,
    # c<->d mutual best; the weak b-c bridge does NOT merge in round 1
    e = _edges(spark, [("a", "b", 0.9), ("b", "c", 0.8), ("c", "d", 0.95)])
    out = affinity_clusters(e, rounds=1).collect()
    lab = {r["url"]: r["cluster_id"] for r in out}
    assert lab["a"] == lab["b"] == "a"
    assert lab["c"] == lab["d"] == "c"
    assert lab["a"] != lab["c"]
    # round 2: the contracted ({a,b},{c,d}) edge (score 0.8) is now
    # each cluster's best -> full merge
    out2 = affinity_clusters(e, rounds=2).collect()
    assert {r["cluster_id"] for r in out2} == {"a"}
    assert {r["n_members"] for r in out2} == {4}


def test_asymmetric_best_still_merges(spark):
    # star: hub h's best is p (0.9), but p/q/r each best h -> one
    # cluster round 1 (each node contributes its own best edge)
    e = _edges(spark, [("h", "p", 0.9), ("h", "q", 0.8), ("h", "r", 0.7)])
    out = affinity_clusters(e, rounds=1).collect()
    assert {r["cluster_id"] for r in out} == {"h"}
    assert {r["n_members"] for r in out} == {4}


def test_score_tie_breaks_by_neighbor_asc(spark):
    # v's two incident edges tie at 0.8: best = smaller neighbor 'a'
    e = _edges(spark, [("a", "v", 0.8), ("b", "v", 0.8)])
    out = affinity_clusters(e, rounds=1).collect()
    lab = {r["url"]: r["cluster_id"] for r in out}
    # v picks a; a picks v; b picks v -> all connected via picked edges
    # (b's own best edge still lands in the forest): one cluster
    assert lab["v"] == lab["a"] == lab["b"] == "a"


def test_fixpoint_equals_connected_components(spark):
    from mediaduplicatefinder_spark.config import DEFAULT_CONFIG
    from mediaduplicatefinder_spark.operators.clustering import (
        connected_components,
    )

    e = _edges(
        spark,
        [
            ("a", "b", 0.9),
            ("b", "c", 0.61),
            ("x", "y", 0.7),
            ("y", "z", 0.65),
            ("p", "q", 0.99),
        ],
    )
    aff = {
        (r["url"], r["cluster_id"])
        for r in affinity_clusters(e, rounds=None).collect()
    }
    cc = {
        (r["url"], r["cluster_id"])
        for r in connected_components(
            e.select("url_a", "url_b"), DEFAULT_CONFIG
        ).collect()
    }
    assert aff == cc


def test_partition_invariance(spark):
    e = _edges(
        spark,
        [("a", "b", 0.9), ("b", "c", 0.8), ("c", "d", 0.95), ("d", "e", 0.7)],
    )
    one = sorted(
        map(tuple, affinity_clusters(e.coalesce(1), rounds=2).collect())
    )
    many = sorted(
        map(tuple, affinity_clusters(e.repartition(7), rounds=2).collect())
    )
    assert one == many
