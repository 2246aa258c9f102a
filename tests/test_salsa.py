"""SALSA (operators/linkgraph.py, Lempel/Moran WWW'00): degree-split
endorsement vs HITS raw sums, determinism, empty input."""

from __future__ import annotations

from mediaduplicatefinder_spark.operators.linkgraph import (
    HITS_SCALE,
    hits_fixed,
    salsa_fixed,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_mega_hub_endorsement_is_split(spark):
    # H1 endorses x exclusively; H2 spreads over y,p,q,r.  HITS sweep-1
    # authority ties x and y (raw hub sums); SALSA divides by the hub's
    # out-degree, so x gets the full endorsement and y a quarter.
    pairs = [("H1", "x"), ("H2", "y"), ("H2", "p"), ("H2", "q"), ("H2", "r")]
    hits = {
        r["host"]: r["auth_scaled"]
        for r in hits_fixed(_edges(spark, pairs), iters=1).collect()
    }
    salsa = {
        r["host"]: r["auth_scaled"]
        for r in salsa_fixed(_edges(spark, pairs), iters=1).collect()
    }
    assert hits["x"] == hits["y"] == HITS_SCALE  # the TKC blind spot
    assert salsa["x"] == HITS_SCALE
    assert salsa["y"] == HITS_SCALE // 4  # endorsement split 4 ways


def test_deterministic_and_empty(spark):
    pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")]
    r1 = sorted(map(tuple, salsa_fixed(_edges(spark, pairs)).collect()))
    r2 = sorted(map(tuple, salsa_fixed(_edges(spark, pairs)).collect()))
    assert r1 == r2 and len(r1) == 3
    assert salsa_fixed(_edges(spark, []).limit(0)).count() == 0


def test_degenerate_all_zero_raw_yields_zero_not_null(spark):
    # ADVICE r4: when every truncating contribution floors to 0 (node
    # degree exceeds the current score — forced here with scale=1 and
    # a degree-2 hub), the per-sweep max is 0 and the old
    # `raw*scale div mx` normalization silently produced NULL scores
    # (non-ANSI div-by-zero).  The greatest(mx, 1) guard must yield
    # integer zeros instead, for both SALSA and HITS' salsa-side
    # degenerate inputs.
    pairs = [("H", "x"), ("H", "y")]
    rows = salsa_fixed(_edges(spark, pairs), iters=1, scale=1).collect()
    assert len(rows) == 3
    for r in rows:
        assert r["auth_scaled"] is not None
        assert r["hub_scaled"] is not None
        assert r["auth_scaled"] == 0 and r["hub_scaled"] == 0
