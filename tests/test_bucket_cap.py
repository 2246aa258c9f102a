"""Skew handling: hot LSH buckets over the cap switch to chain mode —
cluster co-membership must survive (SURVEY.md §4.3 item 1, the
"provably recall-neutral at test scale" requirement)."""

from __future__ import annotations

import dataclasses

from mediaduplicatefinder_spark.config import EngineConfig
from mediaduplicatefinder_spark.pipeline import run_dedup


def test_chain_mode_preserves_boilerplate_cluster(spark, tiny_corpus, tiny_pages_df):
    """Force the boilerplate bucket (14 docs) over a tiny cap: all its
    members must still land in ONE similar cluster, and the cap must be
    accounted in metrics (no silent caps)."""
    pages, truth = tiny_corpus
    cfg = dataclasses.replace(EngineConfig(), bucket_cap=4)
    res = run_dedup(spark, tiny_pages_df, cfg)
    boiler = set(truth[truth.class_kind == "boilerplate_skew"].url)
    rows = [r for r in res.clusters.collect() if r.url in boiler and r.kind == "SIMILAR"]
    assert len(rows) == len(boiler)
    assert len({r.cluster_id for r in rows}) == 1
    m = res.metrics.collect()[0]
    assert m.capped_buckets > 0
    assert m.capped_docs > 0


def test_chain_mode_recall_vs_oracle_star(spark, tiny_corpus, tiny_pages_df):
    """Even with an aggressive cap, reference (seed, member) pairs stay
    co-clustered at >= 0.99."""
    from mediaduplicatefinder_spark.oracle.dedup import Page, run_oracle

    pages, _ = tiny_corpus
    cfg = dataclasses.replace(EngineConfig(), bucket_cap=4)
    res = run_dedup(spark, tiny_pages_df, cfg)
    by_cluster: dict[tuple, list[str]] = {}
    for r in res.clusters.collect():
        by_cluster.setdefault((r.cluster_id, r.kind), []).append(r.url)
    co = set()
    for members in by_cluster.values():
        ms = sorted(members)
        co.update(
            (ms[i], ms[j]) for i in range(len(ms)) for j in range(i + 1, len(ms))
        )
    plist = [Page(r.url, r.text, r.lang, bytes(r.html)) for _, r in pages.iterrows()]
    oracle = run_oracle(plist)
    found = sum(1 for p in oracle.pairs if p in co)
    assert found / max(len(oracle.pairs), 1) >= 0.99


def test_cc_reliable_checkpoint_identical_labels(spark, tmp_path):
    """cfg.cc_reliable_checkpoint=True (reliable checkpoint dir) must
    converge to exactly the labels the localCheckpoint path produces."""
    from dataclasses import replace

    from mediaduplicatefinder_spark.config import DEFAULT_CONFIG
    from mediaduplicatefinder_spark.operators.clustering import connected_components

    # two chains + a triangle, enough to force >1 propagation round
    pairs = (
        [(f"a{i:02d}", f"a{i + 1:02d}") for i in range(12)]
        + [(f"b{i:02d}", f"b{i + 1:02d}") for i in range(7)]
        + [("t00", "t01"), ("t00", "t02"), ("t01", "t02")]
    )
    edges = spark.createDataFrame(pairs, ["url_a", "url_b"])
    base = {tuple(r) for r in connected_components(edges, DEFAULT_CONFIG).collect()}

    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    cfg = replace(DEFAULT_CONFIG, cc_reliable_checkpoint=True)
    reliable = {tuple(r) for r in connected_components(edges, cfg).collect()}
    assert reliable == base
    assert {c for _, c in base} == {"a00", "b00", "t00"}
