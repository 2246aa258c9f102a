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
