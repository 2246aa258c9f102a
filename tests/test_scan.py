"""E176 SCAN: hand-built graphs with known structure (two cliques +
bridge -> two clusters and a hub; chains -> outliers), a python replay
on a random graph, determinism of the border min-rule, and partition
invariance."""

from __future__ import annotations

import itertools
import random
from collections import defaultdict

import pytest

from mediaduplicatefinder_spark.operators.scan import scan_clusters

EPS_N, EPS_D, MU = 7, 10, 3


def _df(spark, edges):
    return spark.createDataFrame(
        [(a, b, 1.0) for a, b in edges],
        "url_a string, url_b string, score double",
    )


def _run(spark, edges, **kw):
    out = {}
    for r in scan_clusters(_df(spark, edges), **kw).collect():
        out[r["url"]] = (r["role"], r["cluster_id"])
    return out


def _replay(edges, eps_n=EPS_N, eps_d=EPS_D, mu=MU):
    """Independent python SCAN with the same deterministic rules."""
    nbrs = defaultdict(set)
    for a, b in edges:
        nbrs[a].add(b)
        nbrs[b].add(a)
    eps = set()
    for a, b in edges:
        cn = len(nbrs[a] & nbrs[b]) + 2
        if eps_d * eps_d * cn * cn >= eps_n * eps_n * (len(nbrs[a]) + 1) * (
            len(nbrs[b]) + 1
        ):
            eps.add((a, b))
    ne = defaultdict(lambda: 1)
    for a, b in eps:
        ne[a] += 1
        ne[b] += 1
    cores = {u for u in nbrs if ne[u] >= mu}
    # CC over core-core eps edges (+ isolated cores)
    parent = {u: u for u in cores}

    def find(u):
        while parent[u] != u:
            parent[u] = parent[parent[u]]
            u = parent[u]
        return u

    for a, b in eps:
        if a in cores and b in cores:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    comp = defaultdict(set)
    for u in cores:
        comp[find(u)].add(u)
    core_lab = {}
    for members in comp.values():
        cid = min(members)
        for u in members:
            core_lab[u] = cid
    border_lab = {}
    for a, b in eps:
        for u, v in ((a, b), (b, a)):
            if u not in cores and v in cores:
                c = core_lab[v]
                border_lab[u] = min(border_lab.get(u, c), c)
    out = {}
    for u in nbrs:
        if u in cores:
            out[u] = ("core", core_lab[u])
        elif u in border_lab:
            out[u] = ("border", border_lab[u])
        else:
            adj = {
                core_lab.get(v, border_lab.get(v))
                for v in nbrs[u]
                if v in cores or v in border_lab
            }
            adj.discard(None)
            out[u] = ("hub" if len(adj) >= 2 else "outlier", None)
    return out


def _clique(prefix, n):
    nodes = [f"{prefix}{i}" for i in range(n)]
    return nodes, list(itertools.combinations(nodes, 2))


def test_two_cliques_with_bridge_hub(spark):
    """The anti-chaining showcase: plain CC merges both cliques via the
    bridge; SCAN keeps two clusters and classifies the bridge a hub."""
    a_nodes, a_edges = _clique("a", 5)
    b_nodes, b_edges = _clique("b", 5)
    edges = a_edges + b_edges + [("a0", "x"), ("x", "b0")]
    got = _run(spark, edges)
    assert {got[u] for u in a_nodes} == {("core", "a0")}
    assert {got[u] for u in b_nodes} == {("core", "b0")}
    assert got["x"] == ("hub", None)


def test_chain_is_all_outliers(spark):
    edges = [(f"n{i}", f"n{i+1}") for i in range(8)]
    got = _run(spark, edges)
    assert set(got.values()) == {("outlier", None)}


def test_single_clique_all_core_one_cluster(spark):
    nodes, edges = _clique("c", 6)
    got = _run(spark, edges)
    assert {got[u] for u in nodes} == {("core", "c0")}


def test_matches_python_replay_random_graph(spark):
    rng = random.Random(17)
    nodes = [f"v{i:03d}" for i in range(60)]
    edges = set()
    # planted dense pockets + random noise edges
    for s in range(0, 60, 12):
        pocket = nodes[s : s + 6]
        edges.update(itertools.combinations(pocket, 2))
    while len(edges) < 140:
        a, b = rng.sample(nodes, 2)
        edges.add((min(a, b), max(a, b)))
    edges = sorted(edges)
    assert _run(spark, edges) == _replay(edges)


def test_partition_invariance(spark):
    rng = random.Random(23)
    nodes = [f"w{i:03d}" for i in range(40)]
    edges = sorted(
        {
            tuple(sorted(rng.sample(nodes, 2)))
            for _ in range(120)
        }
    )
    df1 = _df(spark, edges).coalesce(1)
    df2 = _df(spark, edges).repartition(9)
    r1 = sorted(map(tuple, scan_clusters(df1).collect()))
    r2 = sorted(map(tuple, scan_clusters(df2).collect()))
    assert r1 == r2 and r1
