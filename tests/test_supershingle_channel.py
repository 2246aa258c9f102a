"""E132 pipeline integration: super-shingles over the signature table
as a config-gated candidate channel (candidates.py)."""

from __future__ import annotations

from dataclasses import replace

from mediaduplicatefinder_spark.config import DEFAULT_CONFIG
from mediaduplicatefinder_spark.pipeline import run_dedup


def _clusters(res):
    rows = res.clusters.collect()
    groups: dict = {}
    for r in rows:
        groups.setdefault(r.cluster_id, set()).add(r.url)
    return sorted(frozenset(g) for g in groups.values())


def test_additive_channel_preserves_clusters(spark, tiny_pages_df):
    """Verify gates precision, so extra candidates must not change the
    final cluster assignment."""
    base = run_dedup(spark, tiny_pages_df, DEFAULT_CONFIG)
    on = run_dedup(
        spark,
        tiny_pages_df,
        replace(DEFAULT_CONFIG, use_supershingle_channel=True),
    )
    assert _clusters(base) == _clusters(on)
    base.pairs.unpersist()
    on.pairs.unpersist()


def test_supershingle_only_is_subset_and_finds_near_identical(
    spark, tiny_pages_df, tiny_corpus
):
    _, truth = tiny_corpus
    full = run_dedup(spark, tiny_pages_df, DEFAULT_CONFIG)
    only = run_dedup(
        spark,
        tiny_pages_df,
        replace(DEFAULT_CONFIG, supershingle_only=True),
    )
    pairs_full = {
        (min(r.url_a, r.url_b), max(r.url_a, r.url_b))
        for r in full.pairs.collect()
    }
    pairs_only = {
        (min(r.url_a, r.url_b), max(r.url_a, r.url_b))
        for r in only.pairs.collect()
    }
    # verified pairs from the cheap channel are a subset of the full
    # channel's (precision 1 relative to full: same verify gate)
    assert pairs_only <= pairs_full
    # measured profile on this corpus (config.py note): ~0.72 of the
    # full pair relation, and the near-identical tail is mostly caught
    assert len(pairs_only) >= 0.6 * len(pairs_full) > 0
    scores = {
        (min(r.url_a, r.url_b), max(r.url_a, r.url_b)): r.score
        for r in full.pairs.collect()
    }
    hi = {k for k, s in scores.items() if s >= 0.95}
    assert len(hi & pairs_only) >= 0.8 * len(hi) > 0
    full.pairs.unpersist()
    only.pairs.unpersist()


def test_band_id_spaces_disjoint(spark, tiny_pages_df):
    from mediaduplicatefinder_spark.operators.candidates import (
        _minhash_bands,
        _simhash_bands,
        _supershingle_bands,
    )
    from mediaduplicatefinder_spark.operators.extract import (
        extracted_or_given_text,
    )
    from mediaduplicatefinder_spark.operators.signatures import (
        compute_signatures,
    )

    docs = extracted_or_given_text(tiny_pages_df)
    sigs = compute_signatures(docs, DEFAULT_CONFIG)
    mh = {r.band for r in _minhash_bands(sigs, DEFAULT_CONFIG).select("band").distinct().collect()}
    sh = {r.band for r in _simhash_bands(sigs, DEFAULT_CONFIG).select("band").distinct().collect()}
    ss = {r.band for r in _supershingle_bands(sigs, DEFAULT_CONFIG).select("band").distinct().collect()}
    assert mh.isdisjoint(sh) and mh.isdisjoint(ss) and sh.isdisjoint(ss)
    assert len(ss) == DEFAULT_CONFIG.minhash_bands // DEFAULT_CONFIG.supershingle_group
