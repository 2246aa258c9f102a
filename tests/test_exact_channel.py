"""Exact candidate channel (cfg.exact_candidates, E160): the flagship
pipeline with prefix-filtered exact candidates must produce EXACTLY the
oracle's full pair relation (recall 1.0 AND precision 1.0 — set
equality, not a recall bound) and the same clusters as the LSH channel
on the same corpus."""

from __future__ import annotations

import dataclasses

import pytest

from mediaduplicatefinder_spark.config import DEFAULT_CONFIG
from mediaduplicatefinder_spark.oracle.dedup import (
    Page,
    all_similar_pairs,
    run_oracle,
)
from mediaduplicatefinder_spark.pipeline import run_dedup


@pytest.fixture(scope="module")
def oracle_truth(tiny_pages_df):
    plist = [
        Page(r.url, r.text, r.lang, bytes(r.html))
        for r in tiny_pages_df.orderBy("url").collect()
    ]
    oracle = run_oracle(plist)
    opairs = all_similar_pairs(
        plist, {u for g in oracle.exact_groups for u in g[1:]}
    )
    return oracle, set(opairs)


def _pairs_and_clusters(spark, pages_df, cfg):
    res = run_dedup(spark, pages_df, cfg=cfg, scan_root="")
    pairs = {
        (r.url_a, r.url_b) for r in res.pairs.filter("similar").collect()
    }
    clusters = {
        (r.url, r.cluster_id, r.kind) for r in res.clusters.collect()
    }
    metrics = res.metrics.collect()[0].asDict()
    res.cleanup()
    return pairs, clusters, metrics


def test_exact_channel_equals_oracle_pair_relation(
    spark, tiny_pages_df, oracle_truth
):
    _, opairs = oracle_truth
    cfg = dataclasses.replace(DEFAULT_CONFIG, exact_candidates=True)
    pairs, clusters, metrics = _pairs_and_clusters(spark, tiny_pages_df, cfg)
    assert pairs == opairs  # exact set equality: recall 1.0, extra 0
    assert metrics["capped_buckets"] == 0 and metrics["capped_docs"] == 0

    # same clusters as the LSH channel on this corpus (LSH measures
    # recall 1.0 here, so the two channels must agree end to end)
    lsh_pairs, lsh_clusters, _ = _pairs_and_clusters(
        spark, tiny_pages_df, DEFAULT_CONFIG
    )
    assert pairs == lsh_pairs
    assert clusters == lsh_clusters


def test_exact_channel_128bit_profile(spark, tiny_pages_df, oracle_truth):
    _, opairs = oracle_truth
    cfg = dataclasses.replace(
        DEFAULT_CONFIG, exact_candidates=True, doc_key_bits=128
    )
    pairs, _, _ = _pairs_and_clusters(spark, tiny_pages_df, cfg)
    assert pairs == opairs
