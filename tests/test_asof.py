"""E146 as-of join: semantics vs a pure-python merge_asof reference
(no-match, exact-tie, in-between, stale branches), multi-key
isolation, partition invariance, and DuckDB's native ASOF JOIN as an
independent oracle."""

from __future__ import annotations

import pytest

from mediaduplicatefinder_spark.operators.asof import asof_join


def _ref_asof(left, right, tol=None):
    """left: (id, k, ts); right: (k, ts, payload)."""
    out = {}
    for lid, k, ts in left:
        cand = [(rts, p) for rk, rts, p in right if rk == k and rts <= ts]
        if not cand:
            out[lid] = (None, None, False)
        else:
            rts, p = max(cand)
            stale = None if tol is None else (ts - rts > tol)
            if tol is None:
                stale = False
            out[lid] = (rts, p, stale)
    return out


LEFT = [
    (0, "a", 5),  # before any version -> no match
    (1, "a", 10),  # exact tie with v0 -> matches v0
    (2, "a", 17),  # between v0 and v1
    (3, "a", 20),  # exact tie with v1
    (4, "a", 500),  # far past v2 -> stale under tol=100
    (5, "b", 15),  # key isolation: b's v0 only
    (6, "c", 99),  # key with no versions at all
]
RIGHT = [
    ("a", 10, "a-v0"),
    ("a", 20, "a-v1"),
    ("a", 30, "a-v2"),
    ("b", 12, "b-v0"),
]


@pytest.fixture(scope="module")
def frames(spark):
    l = spark.createDataFrame(LEFT, "event_id long, k string, ts long")
    r = spark.createDataFrame(RIGHT, "k string, ts long, policy string")
    return l, r


def test_matches_reference(spark, frames):
    l, r = frames
    got = {
        row["event_id"]: (row["matched_ts"], row["policy"], row["stale"])
        for row in asof_join(l, r, "k", "ts", ["policy"], tolerance=100).collect()
    }
    want = _ref_asof(LEFT, RIGHT, tol=100)
    assert got == want
    # spot-pin the branches
    assert got[0] == (None, None, False)
    assert got[1] == (10, "a-v0", False)
    assert got[3] == (20, "a-v1", False)
    assert got[4] == (30, "a-v2", True)
    assert got[5] == (12, "b-v0", False)
    assert got[6] == (None, None, False)


def test_no_tolerance_never_stale(spark, frames):
    l, r = frames
    got = {
        row["event_id"]: row["stale"]
        for row in asof_join(l, r, "k", "ts", ["policy"]).collect()
    }
    assert got[4] is False and got[0] is False


def test_no_row_amplification(spark, frames):
    l, r = frames
    out = asof_join(l, r, "k", "ts", ["policy"])
    assert out.count() == len(LEFT)
    assert set(out.columns) == {"event_id", "k", "ts", "matched_ts", "policy", "stale"}


def test_partition_invariance(spark, frames):
    l, r = frames
    a = asof_join(l, r, "k", "ts", ["policy"], tolerance=100).collect()
    b = asof_join(
        l.repartition(5), r.repartition(3), "k", "ts", ["policy"], tolerance=100
    ).collect()
    assert sorted(map(tuple, a), key=str) == sorted(map(tuple, b), key=str)


def test_native_duckdb_asof_parity(spark, frames, tmp_path):
    import duckdb

    l, r = frames
    lp, rp = str(tmp_path / "l.parquet"), str(tmp_path / "r.parquet")
    l.write.mode("overwrite").parquet(lp)
    r.write.mode("overwrite").parquet(rp)
    con = duckdb.connect()
    want = sorted(
        map(
            tuple,
            con.execute(
                f"""
      SELECT l.event_id, l.k, l.ts, r.ts AS matched_ts, r.policy,
             CASE WHEN r.ts IS NULL THEN FALSE ELSE l.ts - r.ts > 100 END AS stale
      FROM parquet_scan('{lp}/*.parquet') l
      ASOF LEFT JOIN parquet_scan('{rp}/*.parquet') r
        ON l.k = r.k AND l.ts >= r.ts
      """
            ).fetchall(),
        ),
        key=str,
    )
    got = sorted(
        map(tuple, asof_join(l, r, "k", "ts", ["policy"], tolerance=100).collect()),
        key=str,
    )
    assert got == want
