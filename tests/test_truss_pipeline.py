"""cfg.truss_filter (E191 acting mode): run_dedup with the verified
edge relation restricted to its k-truss before connected components."""

from __future__ import annotations

import dataclasses

from mediaduplicatefinder_spark.config import DEFAULT_CONFIG
from mediaduplicatefinder_spark.pipeline import run_dedup


def _clusters(res):
    return {
        (r["url"], r["cluster_id"], r["kind"])
        for r in res.clusters.select("url", "cluster_id", "kind").collect()
    }


def test_truss_filter_refines_single_linkage(spark, tiny_pages_df):
    base = run_dedup(spark, tiny_pages_df, DEFAULT_CONFIG, use_html=True)
    cfg = dataclasses.replace(DEFAULT_CONFIG, truss_filter=4)
    truss = run_dedup(spark, tiny_pages_df, cfg, use_html=True)

    base_lab = {
        r["url"]: r["cluster_id"]
        for r in base.clusters.filter("kind = 'SIMILAR'").collect()
    }
    truss_rows = truss.clusters.filter("kind = 'SIMILAR'").collect()
    truss_lab = {r["url"]: r["cluster_id"] for r in truss_rows}

    # refinement: members of one truss cluster were one base cluster
    by_truss = {}
    for url, cid in truss_lab.items():
        by_truss.setdefault(cid, []).append(url)
    for cid, members in by_truss.items():
        assert len({base_lab[u] for u in members}) == 1
    # strictly fewer or equal similar members (chain tails peel away)
    assert len(truss_lab) <= len(base_lab)

    # 4-truss minimum motif is a K4: every surviving cluster has >= 4
    sizes = {}
    for cid in truss_lab.values():
        sizes[cid] = sizes.get(cid, 0) + 1
    assert sizes and min(sizes.values()) >= 4

    # exact sha clusters unaffected by the truss gate
    assert {
        tuple(r)
        for r in base.exact_clusters.select("url", "cluster_id").collect()
    } == {
        tuple(r)
        for r in truss.exact_clusters.select("url", "cluster_id").collect()
    }


def test_lpa_refine_refines_components(spark, tiny_pages_df):
    base = run_dedup(spark, tiny_pages_df, DEFAULT_CONFIG, use_html=True)
    cfg = dataclasses.replace(DEFAULT_CONFIG, lpa_refine_rounds=4)
    lpa = run_dedup(spark, tiny_pages_df, cfg, use_html=True)

    base_lab = {
        r["url"]: r["cluster_id"]
        for r in base.clusters.filter("kind = 'SIMILAR'").collect()
    }
    lpa_rows = lpa.clusters.filter("kind = 'SIMILAR'").collect()
    lpa_lab = {r["url"]: r["cluster_id"] for r in lpa_rows}

    # labels propagate only along edges: every LPA community sits
    # inside one CC component (refinement), and F3 holds (size >= 2)
    by_comm = {}
    for url, cid in lpa_lab.items():
        by_comm.setdefault(cid, []).append(url)
    for cid, members in by_comm.items():
        assert len({base_lab[u] for u in members}) == 1
        assert len(members) >= 2
    # exact channel untouched
    assert base.exact_clusters.count() == lpa.exact_clusters.count()


def test_affinity_round1_refines_components(spark, tiny_pages_df):
    base = run_dedup(spark, tiny_pages_df, DEFAULT_CONFIG, use_html=True)
    cfg = dataclasses.replace(DEFAULT_CONFIG, affinity_rounds=1)
    aff = run_dedup(spark, tiny_pages_df, cfg, use_html=True)

    base_lab = {
        r["url"]: r["cluster_id"]
        for r in base.clusters.filter("kind = 'SIMILAR'").collect()
    }
    aff_lab = {
        r["url"]: r["cluster_id"]
        for r in aff.clusters.filter("kind = 'SIMILAR'").collect()
    }
    # same member universe (every node merges through its best edge),
    # clusters refine CC components, all sizes >= 2
    assert set(aff_lab) == set(base_lab)
    by_cl = {}
    for url, cid in aff_lab.items():
        by_cl.setdefault(cid, []).append(url)
    for cid, members in by_cl.items():
        assert len({base_lab[u] for u in members}) == 1
        assert len(members) >= 2
    # round-1 cut is at least as fine as single linkage
    assert len(by_cl) >= len(set(base_lab.values()))


def test_acting_modes_parallelism_invariant(spark, tiny_pages_df):
    # north-rule determinism extended to the acting paths: identical
    # cluster tuples at any input partitioning
    for cfg in (
        dataclasses.replace(DEFAULT_CONFIG, truss_filter=4),
        dataclasses.replace(DEFAULT_CONFIG, lpa_refine_rounds=4),
        dataclasses.replace(DEFAULT_CONFIG, affinity_rounds=1),
    ):
        one = _clusters(
            run_dedup(spark, tiny_pages_df.coalesce(1), cfg, use_html=True)
        )
        many = _clusters(
            run_dedup(
                spark, tiny_pages_df.repartition(13), cfg, use_html=True
            )
        )
        assert one == many


def test_truss_rounds_pins_unrolled_state(spark, tiny_pages_df):
    # rounds=3 (the oracle profile) must agree with the fixpoint on
    # this corpus (small graphs converge fast; equality is evidence
    # the pinned profile is the converged truss here)
    c3 = _clusters(
        run_dedup(
            spark,
            tiny_pages_df,
            dataclasses.replace(
                DEFAULT_CONFIG, truss_filter=4, truss_rounds=3
            ),
            use_html=True,
        )
    )
    cfix = _clusters(
        run_dedup(
            spark,
            tiny_pages_df,
            dataclasses.replace(DEFAULT_CONFIG, truss_filter=4),
            use_html=True,
        )
    )
    assert c3 == cfix
