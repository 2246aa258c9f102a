"""E180 two-phase CC (Large-Star/Small-Star): label parity with the
pipeline's min-label-propagation CC on adversarial graph shapes
(chains, stars, cliques, random), fixpoint structure, and partition
invariance — two published algorithms, one answer."""

from __future__ import annotations

import random

import pytest

from mediaduplicatefinder_spark.config import DEFAULT_CONFIG
from mediaduplicatefinder_spark.operators.clustering import (
    connected_components,
)
from mediaduplicatefinder_spark.operators.twophasecc import (
    _large_star,
    _small_star,
    twophase_cc,
)


def _edges(spark, pairs, parts=4):
    return spark.createDataFrame(
        [(a, b) for a, b in pairs], "url_a string, url_b string"
    ).repartition(parts)


def _labels(df):
    return sorted((r["url"], r["cluster_id"]) for r in df.collect())


def _py_cc(pairs):
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    nodes = {n for p in pairs for n in p}
    roots = {}
    for n in nodes:
        roots.setdefault(find(n), []).append(n)
    out = []
    for r, members in roots.items():
        m = min(members)
        out.extend((n, m) for n in members)
    return sorted(out)


CASES = {
    "chain": [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(30)],
    "star": [("n000", f"n{i:03d}") for i in range(1, 20)],
    "two_cliques_bridge": (
        [(f"a{i}", f"a{j}") for i in range(5) for j in range(i + 1, 5)]
        + [(f"b{i}", f"b{j}") for i in range(5) for j in range(i + 1, 5)]
        + [("a0", "b0")]
    ),
    "singleton_edges": [("x1", "x2"), ("y1", "y2"), ("z1", "z2")],
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_matches_python_and_pipeline_cc(spark, name):
    pairs = CASES[name]
    got = _labels(twophase_cc(_edges(spark, pairs)))
    assert got == _py_cc(pairs)
    assert got == _labels(connected_components(_edges(spark, pairs)))


def test_random_graph_parity(spark):
    rng = random.Random(5)
    nodes = [f"u{i:04d}" for i in range(120)]
    pairs = sorted(
        {
            tuple(sorted(rng.sample(nodes, 2)))
            for _ in range(150)
        }
    )
    got = _labels(twophase_cc(_edges(spark, pairs, 9)))
    assert got == _py_cc(pairs)
    assert got == _labels(connected_components(_edges(spark, pairs, 3)))


def test_fixpoint_is_star_forest(spark):
    # after convergence every edge must point member -> component min
    pairs = CASES["chain"]
    cur = _edges(spark, pairs).selectExpr("url_a as u", "url_b as v")
    cur = cur.distinct()
    for _ in range(12):
        cur = _small_star(_large_star(cur)).localCheckpoint(eager=True)
    rows = {(r["u"], r["v"]) for r in cur.collect()}
    assert rows == {(f"n{i:03d}", "n000") for i in range(1, 31)}


def test_partition_invariance(spark):
    pairs = CASES["two_cliques_bridge"]
    a = _labels(twophase_cc(_edges(spark, pairs, 1)))
    b = _labels(twophase_cc(_edges(spark, pairs, 11)))
    assert a == b
