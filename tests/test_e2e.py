"""Golden end-to-end: full Spark pipeline vs the oracle port on the
planted-class corpus (SURVEY.md §5.2 layers 1+3)."""

from __future__ import annotations

import pytest

from mediaduplicatefinder_spark.oracle.dedup import (
    Page,
    all_similar_pairs,
    run_oracle,
)
from mediaduplicatefinder_spark.pipeline import run_dedup


@pytest.fixture(scope="module")
def e2e(spark, tiny_corpus, tiny_pages_df):
    pages, truth = tiny_corpus
    result = run_dedup(spark, tiny_pages_df)
    plist = [
        Page(r.url, r.text, r.lang, bytes(r.html)) for _, r in pages.iterrows()
    ]
    oracle = run_oracle(plist)
    exclude = {u for g in oracle.exact_groups for u in g[1:]}
    full_pairs = all_similar_pairs(plist, exclude)
    engine_pairs = {
        (r.url_a, r.url_b): r.score
        for r in result.pairs.filter("similar").collect()
    }
    return pages, truth, result, oracle, full_pairs, engine_pairs


def test_exact_groups_identical(e2e):
    _, _, result, oracle, _, _ = e2e
    got: dict[str, set] = {}
    for r in result.exact_clusters.collect():
        got.setdefault(r.cluster_id, set()).add(r.url)
    expected = {min(g): set(g) for g in oracle.exact_groups}
    assert got == expected


def _co_membership(result) -> set[tuple[str, str]]:
    """Dup pairs as the north rule counts them: same-cluster membership."""
    by_cluster: dict[tuple, list[str]] = {}
    for r in result.clusters.collect():
        by_cluster.setdefault((r.cluster_id, r.kind), []).append(r.url)
    out = set()
    for members in by_cluster.values():
        ms = sorted(members)
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                out.add((ms[i], ms[j]))
    return out


def test_pair_recall_vs_star(e2e):
    """The reference's actual (seed, member) links must be co-clustered:
    the recall >= 0.99 bar (BASELINE.json)."""
    _, _, result, oracle, _, _ = e2e
    co = _co_membership(result)
    found = sum(1 for p in oracle.pairs if p in co)
    assert found / max(len(oracle.pairs), 1) >= 0.99


def test_pair_recall_vs_full_relation(e2e):
    """Stronger: every pair of the full pairwise similar relation
    co-clustered (edge-level recall on the verified pair list)."""
    _, _, _, _, full_pairs, engine_pairs = e2e
    found = sum(1 for p in full_pairs if p in engine_pairs)
    assert found / max(len(full_pairs), 1) >= 0.99


def test_no_false_pairs(e2e):
    """Verify stage uses the exact reference predicate -> precision 1.0
    vs the full pairwise relation."""
    _, _, _, _, full_pairs, engine_pairs = e2e
    extras = set(engine_pairs) - set(full_pairs)
    assert not extras


def test_pair_scores_match_oracle(e2e):
    _, _, _, _, full_pairs, engine_pairs = e2e
    for p, score in engine_pairs.items():
        assert score == pytest.approx(full_pairs[p], abs=1e-9)


def test_crosslang_twins_never_pair(e2e):
    pages, truth, _, _, _, engine_pairs = e2e
    twins = truth[truth.class_kind == "crosslang_negative"]
    by_class: dict[int, list[str]] = {}
    for _, r in twins.iterrows():
        by_class.setdefault(r.class_id, []).append(r.url)
    assert len(by_class) > 0
    for urls in by_class.values():
        urls = sorted(urls)
        for i in range(len(urls)):
            for j in range(i + 1, len(urls)):
                assert (urls[i], urls[j]) not in engine_pairs


def test_trunc_pairs_cluster(e2e):
    """Docs identical in the first 50 lines must pair even with
    divergent tails (main_cli.cpp:260-270)."""
    pages, truth, result, _, _, engine_pairs = e2e
    tp = truth[truth.class_kind == "trunc_pair"]
    by_class: dict[int, list[str]] = {}
    for _, r in tp.iterrows():
        by_class.setdefault(r.class_id, []).append(r.url)
    paired_urls = {u for p in engine_pairs for u in p}
    for urls in by_class.values():
        if len(urls) == 2:
            a, b = sorted(urls)
            assert (a, b) in engine_pairs or {a, b} <= paired_urls


def test_boilerplate_skew_fully_clustered(e2e):
    """All boilerplate-farm pages (J ~ 0.94 template overlap) land in one
    SIMILAR cluster — the skew case salting/chaining must not break."""
    pages, truth, result, _, _, _ = e2e
    boiler = set(truth[truth.class_kind == "boilerplate_skew"].url)
    rows = [
        r
        for r in result.clusters.collect()
        if r.url in boiler and r.kind == "SIMILAR"
    ]
    assert len(rows) == len(boiler)
    assert len({r.cluster_id for r in rows}) == 1


def test_cluster_invariants(e2e):
    _, _, result, _, _, _ = e2e
    rows = result.clusters.collect()
    # cluster_id = min(url) per cluster; exactly one keeper per cluster
    by_cluster: dict[str, list] = {}
    for r in rows:
        by_cluster.setdefault((r.cluster_id, r.kind), []).append(r)
    for (cid, kind), members in by_cluster.items():
        assert len(members) >= 2
        assert min(m.url for m in members) == cid
        assert sum(1 for m in members if m.is_keeper) == 1


def test_metrics_row(e2e):
    _, _, result, _, _, _ = e2e
    m = result.metrics.collect()[0]
    assert m.n_pages == 200
    assert m.n_similar_pairs > 0
    assert m.capped_buckets == 0  # tiny corpus: no bucket over the cap


def test_128bit_doc_key_profile_matches_64bit(spark, tiny_pages_df):
    """cfg.doc_key_bits = 128 (the 10^12-doc collision profile) rides a
    second independent key column through bands/pairs/verify — output
    clusters and pairs must be identical to the 64-bit run, and the plan
    keeps the same shape (one banding exchange; pair identity now four
    int64 columns)."""
    from mediaduplicatefinder_spark.config import EngineConfig

    base = run_dedup(spark, tiny_pages_df)
    wide = run_dedup(spark, tiny_pages_df, EngineConfig(doc_key_bits=128))

    def clusters(res):
        return sorted(
            (r.url, r.cluster_id, r.kind, round(r.score, 9))
            for r in res.clusters.collect()
        )

    def pairs(res):
        return sorted(
            (r.url_a, r.url_b, round(r.jaccard, 9), r.similar)
            for r in res.pairs.collect()
        )

    assert clusters(base) == clusters(wide)
    assert pairs(base) == pairs(wide)

    # plan shape: the wide profile joins on both key columns
    from tests.test_plans import plan_of

    p = plan_of(wide.pairs)
    assert "key_a2" in p and "key_b2" in p
    base.cleanup()
    wide.cleanup()
