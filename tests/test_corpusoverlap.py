"""E175 bottom-k corpus overlap: the estimator must track planted
overlap within the k=256 error bar, fall back to EXACT agreement when
groups are smaller than k, stay partition-invariant (the KMV local
prune), and report exact columns that match a python reference."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from mediaduplicatefinder_spark.functions.sigcore import token_seq
from mediaduplicatefinder_spark.operators.corpusoverlap import (
    corpus_overlap,
)


def _pages(spark, rows):
    return spark.createDataFrame(
        [(u, None, t, g) for (u, g, t) in rows],
        "url string, warc_ts timestamp, text string, lang string",
    )


@pytest.fixture(scope="module")
def planted(spark):
    """Two groups sharing ~60% of a large vocabulary; one tiny group."""
    rng = random.Random(3)
    common = [f"tok{i:05d}" for i in range(3000)]
    only_a = [f"aaa{i:05d}" for i in range(1000)]
    only_b = [f"bbb{i:05d}" for i in range(1000)]

    def docs_of(grp, vocab, n_docs):
        out = []
        for i in range(n_docs):
            words = rng.sample(vocab, 300)
            out.append((f"doc://{grp}{i:07d}", grp, " ".join(words)))
        return out

    rows = (
        docs_of("ga", common + only_a, 60)
        + docs_of("gb", common + only_b, 60)
        + [("doc://gc0000001", "gc", "tiny corpus tok00001 tok00002")]
    )
    return rows


def _exact(rows):
    sets: dict = {}
    for (_, g, t) in rows:
        sets.setdefault(g, set()).update(token_seq(t, 3))
    out = {}
    gs = sorted(sets)
    for i in range(len(gs)):
        for j in range(i + 1, len(gs)):
            a, b = sets[gs[i]], sets[gs[j]]
            out[(gs[i], gs[j])] = len(a & b) / len(a | b)
    return out


def test_estimator_tracks_planted_overlap(spark, planted):
    res = {
        (r["grp_a"], r["grp_b"]): r
        for r in corpus_overlap(_pages(spark, planted), k=256).collect()
    }
    truth = _exact(planted)
    assert set(res) == set(truth)
    for pair, t in truth.items():
        r = res[pair]
        # exact column == python truth (token semantics + fnv distinct)
        assert abs(r["exact_jaccard"] - t) < 1e-12, pair
        # estimate within 4 standard errors of k=256 (se ~ 0.031)
        assert abs(r["est_jaccard"] - t) <= 4 / (256**0.5) + 1e-12, (
            pair,
            r["est_jaccard"],
            t,
        )


def test_small_group_estimate_is_exact(spark, planted):
    """A group with < k distinct hashes sketches itself completely:
    the union slice is the true union, so the estimate IS the exact
    Jaccard for pairs of two small groups."""
    rows = [
        ("doc://x00000001", "gx", "alpha beta gamma delta"),
        ("doc://y00000001", "gy", "alpha beta epsilon zeta"),
    ]
    r = corpus_overlap(_pages(spark, rows), k=256).collect()[0]
    assert abs(r["est_jaccard"] - r["exact_jaccard"]) < 1e-12
    assert abs(r["exact_jaccard"] - 2 / 6) < 1e-12


def test_partition_invariance(spark, planted):
    pages = _pages(spark, planted)
    one = sorted(
        map(tuple, corpus_overlap(pages.coalesce(1), k=256).collect())
    )
    many = sorted(
        map(tuple, corpus_overlap(pages.repartition(17), k=256).collect())
    )
    assert one == many and one


def test_containment_column(spark):
    rows = [
        ("doc://a00000001", "ga", "one two three four"),
        ("doc://b00000001", "gb", "one two three four five six seven eight"),
    ]
    r = corpus_overlap(_pages(spark, rows), k=16).collect()[0]
    # grp_a='ga' (4 tokens, all contained in gb's 8)
    assert r["grp_a"] == "ga" and abs(r["exact_containment_a"] - 1.0) < 1e-12
