"""E91 ensemble clusters (driver composition over fusion + CC)."""

from __future__ import annotations

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def test_ensemble_invariants(spark):
    rows = entry.queries()["ensemble_clusters"](spark, SF).collect()
    assert rows  # the truncated-copy injection guarantees clusters
    by_cluster: dict[int, set[int]] = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, set()).add(r.doc_id)
    for cid, members in by_cluster.items():
        assert cid == min(members)  # min-label semantics
        assert len(members) >= 2  # degree-0 nodes never emitted
    sizes = {r.doc_id: r.cluster_size for r in rows}
    for cid, members in by_cluster.items():
        for m in members:
            assert sizes[m] == len(members)
    # every member pair is channel-confirmed >= 2 transitively:
    # spot-check that fused pairs with n_channels >= 2 land in one
    # cluster together
    fused = entry.queries()["channel_fusion"](spark, SF).collect()
    label = {r.doc_id: r.cluster_id for r in rows}
    for f in fused:
        if f.n_channels >= 2:
            assert label[f.doc_a] == label[f.doc_b]
