"""E96 composed crawl-frontier flagship (driver composition)."""

from __future__ import annotations

import __spark_entry__ as entry

SF = "/root/testdata/sf0.001"


def test_frontier_invariants(spark):
    rows = entry.queries()["crawl_frontier"](spark, SF).collect()
    assert len(rows) == 500  # one decision row per url
    n_eligible = sum(r.eligible for r in rows)
    assert 0 < n_eligible < len(rows)
    per_host_kept: dict[str, int] = {}
    for r in rows:
        assert r.eligible == (r.robots_allowed and r.kept_quota)
        # robots: /priv paths denied, everything else allowed
        assert r.robots_allowed == (not r.path.startswith("/priv"))
        if r.kept_quota:
            assert 1 <= r.wave <= 8
            per_host_kept[r.host] = per_host_kept.get(r.host, 0) + 1
        else:
            assert r.wave is None
        assert r.pr_scaled > 0  # every host is in the link graph
    assert max(per_host_kept.values()) <= 8
