"""E136 multi-threshold dedup ladder (__spark_entry__._q_threshold_ladder)."""

from __future__ import annotations

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def _ladder(spark):
    rows = entry._q_threshold_ladder(spark, SF).collect()
    by_thr: dict = {}
    for r in rows:
        by_thr.setdefault(r.threshold, {})[r.doc_id] = (
            r.cluster_id,
            r.cluster_size,
        )
    return by_thr


def test_refinement_and_monotonicity(spark):
    by_thr = _ladder(spark)
    thrs = sorted(by_thr)
    assert thrs == [0.6, 0.75, 0.9]
    # members shrink as the threshold rises
    assert (
        set(by_thr[0.9]) <= set(by_thr[0.75]) <= set(by_thr[0.6])
    )
    # refinement: docs sharing a cluster at a higher threshold must
    # share one at every lower threshold
    for hi, lo in ((0.9, 0.75), (0.75, 0.6)):
        for doc, (cid, _) in by_thr[hi].items():
            peers = [
                d for d, (c, _) in by_thr[hi].items() if c == cid
            ]
            lo_cids = {by_thr[lo][d][0] for d in peers}
            assert len(lo_cids) == 1, (hi, lo, cid, lo_cids)


def test_cluster_invariants(spark):
    by_thr = _ladder(spark)
    for thr, docs in by_thr.items():
        sizes: dict = {}
        for d, (cid, sz) in docs.items():
            sizes.setdefault(cid, []).append((d, sz))
        for cid, members in sizes.items():
            # label is the min member; every row carries the true size;
            # CC discards singletons
            assert cid == min(d for d, _ in members)
            assert all(sz == len(members) for _, sz in members)
            assert len(members) >= 2
