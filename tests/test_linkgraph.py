"""E77 host link graph + fixed-point PageRank (operators/linkgraph.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mediaduplicatefinder_spark.operators.linkgraph import (
    PR_SCALE,
    extract_host_links,
    linkgraph_pagerank,
    pagerank_fixed,
)


def _tdiv(a: int, b: int) -> int:
    """Truncating integer division (Spark div / DuckDB //)."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def _replay(edges: set[tuple[str, str]], iters: int = 5) -> dict[str, int]:
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    od = {h: sum(1 for s, _ in edges if s == h) for h in nodes}
    r = {h: PR_SCALE for h in nodes}
    base = _tdiv(15 * PR_SCALE, 100)
    for _ in range(iters):
        s = {h: 0 for h in nodes}
        for u, v in edges:
            if od[u] > 0:
                s[v] += _tdiv(r[u], od[u])
        r = {h: base + _tdiv(85 * s[h], 100) for h in nodes}
    return r


def test_extract_links(spark):
    pages = spark.createDataFrame(
        [
            (
                "http://a.com/x",
                '<p><a href="http://b.com/1">x</a>'
                '<a href="http://c.com/2?q=3">y</a>'
                '<a href="http://a.com/self">self</a>'
                '<a href="https://skipped.com/s">not-http-match</a></p>',
            ),
            ("http://b.com/y", '<a href="http://c.com/9">z</a>'),
            ("http://b.com/z", '<a href="http://c.com/9">dup page</a>'),
        ],
        "url string, html string",
    )
    edges = {
        (r.src, r.dst) for r in extract_host_links(pages).collect()
    }
    assert edges == {("a.com", "b.com"), ("a.com", "c.com"), ("b.com", "c.com")}


def test_pagerank_matches_replay(spark):
    edges = {
        ("a", "b"),
        ("b", "c"),
        ("c", "a"),
        ("a", "c"),
        ("d", "a"),  # d has no inlinks; gets base rank only
    }
    df = spark.createDataFrame(sorted(edges), "src string, dst string")
    got = {r.host: r for r in pagerank_fixed(df).collect()}
    want = _replay(edges)
    assert {h: r.pr_scaled for h, r in got.items()} == want
    assert got["d"].indeg == 0 and got["d"].od == 1
    assert got["a"].od == 2
    # d never receives mass: exactly the teleport base
    assert got["d"].pr_scaled == _tdiv(15 * PR_SCALE, 100)
    # sink-free cycle members outrank the no-inlink node
    assert min(got[h].pr_scaled for h in "abc") > got["d"].pr_scaled


def test_dangling_contributes_nothing(spark):
    # b has no outlinks: its mass leaks (documented dangling-drop)
    edges = {("a", "b")}
    df = spark.createDataFrame(sorted(edges), "src string, dst string")
    got = {r.host: r.pr_scaled for r in pagerank_fixed(df).collect()}
    assert got == _replay(edges)
    assert got["b"] > got["a"]  # b receives, a only bases


def test_rank_bounds(spark):
    edges = {(f"h{i}", f"h{(i * 3 + 1) % 11}") for i in range(11)}
    edges = {(s, d) for s, d in edges if s != d}
    df = spark.createDataFrame(sorted(edges), "src string, dst string")
    rows = pagerank_fixed(df).collect()
    n = len({h for e in edges for h in e})
    total = sum(r.pr_scaled for r in rows)
    # leaks only via truncation: total within n units + damping slack
    assert total <= n * PR_SCALE
    assert all(r.pr_scaled > 0 for r in rows)


def test_end_to_end_shape(spark):
    pages = spark.createDataFrame(
        [
            (
                f"http://s{i % 5}.net/p{i}",
                f'<a href="http://s{(i + 1) % 5}.net/n">n</a>',
            )
            for i in range(20)
        ],
        "url string, html string",
    )
    rows = linkgraph_pagerank(pages).collect()
    assert len(rows) == 5
    assert {r.od for r in rows} == {1}
    assert {r.indeg for r in rows} == {1}
    prs = {r.pr_scaled for r in rows}
    assert len(prs) == 1  # symmetric ring: identical ranks
    assert prs.pop() == pytest.approx(PR_SCALE, rel=0.01)
