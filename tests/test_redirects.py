"""E119 redirect-chain resolution (operators/redirects.py)."""

from __future__ import annotations

from mediaduplicatefinder_spark.operators.redirects import (
    resolve_redirects,
)


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "url string, target string")
    return {r.url: r for r in resolve_redirects(df, **kw).collect()}


def test_chain_resolution_and_hops(spark):
    got = _run(
        spark,
        [("a", "b"), ("b", "c"), ("c", "final"), ("solo", "end")],
    )
    assert (got["a"].final_url, got["a"].hops, got["a"].is_loop) == (
        "final",
        3,
        False,
    )
    assert got["b"].hops == 2 and got["b"].final_url == "final"
    assert got["solo"].hops == 1 and got["solo"].final_url == "end"


def test_two_cycle_and_chain_into_loop(spark):
    got = _run(
        spark,
        [("a", "b"), ("b", "a"), ("x", "a")],
        max_hops=8,
    )
    assert got["a"].is_loop and got["a"].final_url is None
    assert got["a"].hops == 8  # f^max_hops applied, matching the twin
    assert got["x"].is_loop and got["x"].final_url is None


def test_long_chain_beyond_hop_budget_flags(spark):
    chain = [(f"n{i}", f"n{i+1}") for i in range(10)]  # 10 hops to n10
    got = _run(spark, chain, max_hops=8)
    assert got["n0"].is_loop  # policy: don't follow over-long chains
    # a suffix within budget resolves fine
    assert got["n5"].final_url == "n10" and got["n5"].hops == 5


def test_self_redirect(spark):
    got = _run(spark, [("s", "s")])
    assert got["s"].is_loop and got["s"].final_url is None


def _py_walk(edges, url, max_hops=8):
    f = dict(edges)
    cur, hops = f[url], 1
    while cur in f and hops < max_hops:
        cur, hops = f[cur], hops + 1
    return (None if cur in f else cur, hops, cur in f)


def test_seeded_fuzz_vs_python_walk(spark):
    import random

    rng = random.Random(1)
    # random functional graph over 40 nodes: chains, trees-into-chains,
    # cycles, self-loops all arise
    nodes = [f"n{i}" for i in range(40)]
    edges = []
    for u in nodes:
        if rng.random() < 0.8:
            edges.append((u, rng.choice(nodes + ["t1", "t2", "t3"])))
    got = _run(spark, edges)
    for u, _t in edges:
        want_final, want_hops, want_loop = _py_walk(edges, u)
        r = got[u]
        assert (r.final_url, r.hops, r.is_loop) == (
            want_final,
            want_hops,
            want_loop,
        ), (u, r)
