"""Strict star-parity replay (operators/starparity.py) vs the oracle's
greedy star scan — group structure must match EXACTLY, not just the
pair set."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mediaduplicatefinder_spark.config import DEFAULT_CONFIG
from mediaduplicatefinder_spark.oracle import dedup as oracle
from mediaduplicatefinder_spark.operators.starparity import star_parity_groups
from mediaduplicatefinder_spark.pipeline import run_dedup


@pytest.fixture(scope="module")
def star_setup(spark, tiny_corpus):
    pages_pdf, _ = tiny_corpus
    pages_df = spark.createDataFrame(pages_pdf)
    res = run_dedup(spark, pages_df, DEFAULT_CONFIG)
    from mediaduplicatefinder_spark.operators.clustering import connected_components
    from mediaduplicatefinder_spark.operators.verify import similar_edges

    edges = similar_edges(res.pairs)
    labels = connected_components(edges, DEFAULT_CONFIG)
    stars = star_parity_groups(labels, edges).collect()

    opages = [
        oracle.Page(url=r.url, text=r.text, lang=r.lang, html=bytes(r.html))
        for r in pages_pdf.itertuples()
    ]
    ores = oracle.run_oracle(opages)
    return stars, ores


def _spark_groups(stars):
    groups: dict[str, list[tuple[str, float]]] = {}
    for r in stars:
        groups.setdefault(r.star_seed, []).append((r.url, r.score))
    # member order: seed first, then url order (oracle emits scan order)
    out = []
    for seed, members in groups.items():
        rest = sorted([m for m in members if m[0] != seed])
        out.append([(seed, 1.0)] + rest)
    return sorted(out)


def _oracle_groups(ores):
    out = []
    for g in ores.similar_groups:
        seed = g[0]
        rest = sorted(g[1:])
        out.append([seed] + rest)
    return sorted(out)


def test_star_groups_match_oracle_exactly(star_setup):
    stars, ores = star_setup
    got = _spark_groups(stars)
    expect = _oracle_groups(ores)
    got_urls = [[u for u, _s in g] for g in got]
    expect_urls = [[u for u, _s in g] for g in expect]
    assert got_urls == expect_urls


def test_star_member_scores_match_oracle(star_setup):
    stars, ores = star_setup
    oracle_scores = {}
    for g in ores.similar_groups:
        seed = g[0][0]
        for url, score in g:
            oracle_scores[(seed, url)] = score
    for r in stars:
        assert (r.star_seed, r.url) in oracle_scores
        assert r.score == pytest.approx(
            oracle_scores[(r.star_seed, r.url)], abs=1e-6
        )


def test_star_groups_partition_invariant(spark, star_setup, tiny_corpus):
    pages_pdf, _ = tiny_corpus
    pages_df = spark.createDataFrame(pages_pdf).repartition(7)
    res = run_dedup(spark, pages_df, DEFAULT_CONFIG)
    from mediaduplicatefinder_spark.operators.clustering import connected_components
    from mediaduplicatefinder_spark.operators.verify import similar_edges

    edges = similar_edges(res.pairs)
    labels = connected_components(edges, DEFAULT_CONFIG)
    stars2 = star_parity_groups(labels, edges).collect()
    stars1, _ = star_setup
    assert sorted((r.url, r.star_seed, r.score) for r in stars1) == sorted(
        (r.url, r.star_seed, r.score) for r in stars2
    )


def test_replay_linear_on_10k_chain():
    """A 10k-node chain component (the capped-hot-bucket shape that CC
    merges into ONE component) must replay in O(edges), not O(n^2)."""
    import time

    import pandas as pd

    from mediaduplicatefinder_spark.operators.starparity import _replay_component

    n = 10_000
    urls = [f"u{i:06d}" for i in range(n)]
    pdf = pd.DataFrame(
        {
            "cluster_id": ["u000000"] * (n - 1),
            "url_a": urls[:-1],
            "url_b": urls[1:],
            "score": [0.7] * (n - 1),
            "lang": ["en"] * (n - 1),
        }
    )
    t0 = time.time()
    out = _replay_component(pdf)
    dt = time.time() - t0
    assert dt < 5.0, f"chain replay took {dt:.1f}s"
    # greedy scan over a chain: (u0,u1), (u2,u3), ... all size-2 stars
    assert len(out) == n
    assert (out.groupby("star_seed").size() == 2).all()
