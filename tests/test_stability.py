"""E153 cluster stability: exact pair algebra on hand-built cluster
relations covering preserved / broken / merged / growth-excluded
branches, label-renumbering insensitivity, and partition invariance."""

from __future__ import annotations

import pytest

from mediaduplicatefinder_spark.operators.stability import (
    PPM,
    cluster_stability,
    co_membership_pairs,
)


def _clusters(spark, rows):
    return spark.createDataFrame(rows, "url string, kind string, cluster_id string")


@pytest.fixture(scope="module")
def scenario(spark):
    # run A: {u1,u2,u3} similar, {u4,u5} exact, u6 singleton-free
    a = _clusters(spark, [
        ("u1", "SIMILAR", "c1"), ("u2", "SIMILAR", "c1"),
        ("u3", "SIMILAR", "c1"),
        ("u4", "EXACT", "e1"), ("u5", "EXACT", "e1"),
    ])
    # run B (grown corpus): u3 fell out of c1 (broken pairs), a new doc
    # n1 bridges u6+u4's family (merged pairs between old docs u4,u6),
    # plus a pure-new cluster that must not count
    b = _clusters(spark, [
        ("u1", "SIMILAR", "k1"), ("u2", "SIMILAR", "k1"),  # renumbered!
        ("u4", "EXACT", "k2"), ("u5", "EXACT", "k2"),
        ("u6", "SIMILAR", "k3"), ("u4", "SIMILAR", "k3"), ("n1", "SIMILAR", "k3"),
        ("n2", "EXACT", "k4"), ("n3", "EXACT", "k4"),
    ])
    known = spark.createDataFrame(
        [(f"u{i}",) for i in range(1, 7)], "url string"
    )
    return a, b, known


def test_pair_algebra(spark, scenario):
    a, b, known = scenario
    r = cluster_stability(a, b, known).collect()[0]
    # pairs_a: c1 -> 3 pairs, e1 -> 1 pair
    assert r["pairs_a"] == 4
    # preserved: (u1,u2) and (u4,u5); broken: (u1,u3), (u2,u3)
    assert r["preserved"] == 2
    assert r["broken"] == 2
    # merged_new: (u4,u6) via bridge n1; pairs touching n1/n2/n3 excluded
    assert r["merged_new"] == 1
    assert r["pairs_b_known"] == 3
    assert r["preserved_ppm"] == 2 * PPM // 4


def test_renumbered_labels_not_churn(spark, scenario):
    """Same memberships under different cluster ids must read as 100%
    preserved — the report is label-free by construction."""
    a, _, known = scenario
    relabeled = _clusters(spark, [
        ("u1", "SIMILAR", "zz"), ("u2", "SIMILAR", "zz"),
        ("u3", "SIMILAR", "zz"),
        ("u4", "EXACT", "yy"), ("u5", "EXACT", "yy"),
    ])
    r = cluster_stability(a, relabeled, known).collect()[0]
    assert r["broken"] == 0 and r["merged_new"] == 0
    assert r["preserved_ppm"] == PPM


def test_kind_is_part_of_the_key(spark):
    """Same cluster_id under different kinds must not pair up."""
    c = _clusters(spark, [("a", "EXACT", "c1"), ("b", "SIMILAR", "c1")])
    assert co_membership_pairs(c).count() == 0


def test_partition_invariance(spark, scenario):
    a, b, known = scenario
    x = cluster_stability(a, b, known).collect()
    y = cluster_stability(
        a.repartition(5), b.repartition(3), known.repartition(2)
    ).collect()
    assert sorted(map(tuple, x)) == sorted(map(tuple, y))
