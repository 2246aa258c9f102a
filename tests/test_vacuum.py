"""E149 vacuum planner: every status/action branch vs a hand-worked
scenario, the safety property (no retained-snapshot-reachable file is
ever deleted), retention-window monotonicity, partition invariance,
and the DuckDB twin."""

from __future__ import annotations

import pytest

from mediaduplicatefinder_spark.operators.vacuum import (
    vacuum_plan,
    vacuum_plan_sql,
)

CURRENT, RETAIN = 10, 3  # retained snapshots: 8, 9, 10


@pytest.fixture(scope="module")
def tables(spark):
    # (path, size, added, deleted): every reachability case
    manifest = [
        ("live-never-deleted.pq", 100, 2, None),
        ("live-deleted-late.pq", 110, 3, 9),    # 9 > oldest(8): retained 8 still sees it
        ("expired-old.pq", 120, 1, 5),           # gone before window
        ("expired-boundary.pq", 130, 2, 8),      # deleted AT oldest: unreachable
        ("expired-absent.pq", 140, 1, 4),        # expired AND already gone from disk
        ("missing-live.pq", 150, 7, None),       # manifest live, not on disk
    ]
    storage = [
        ("live-never-deleted.pq", 100),
        ("live-deleted-late.pq", 110),
        ("expired-old.pq", 120),
        ("expired-boundary.pq", 130),
        ("orphan-tmp.pq", 55),                   # on disk, never in manifest
    ]
    m = spark.createDataFrame(
        manifest, "path string, size_bytes long, added_seq long, deleted_seq long"
    )
    s = spark.createDataFrame(storage, "path string, size_bytes long")
    return m, s


def test_every_branch(spark, tables):
    m, s = tables
    got = {
        r["path"]: (r["status"], r["action"])
        for r in vacuum_plan(m, s, CURRENT, RETAIN).collect()
    }
    assert got == {
        "live-never-deleted.pq": ("live", "keep"),
        "live-deleted-late.pq": ("live", "keep"),
        "expired-old.pq": ("expired", "delete"),
        "expired-boundary.pq": ("expired", "delete"),
        "expired-absent.pq": ("expired", "none"),
        "missing-live.pq": ("missing", "alert"),
        "orphan-tmp.pq": ("orphan", "delete"),
    }


def test_safety_no_reachable_delete(spark, tables):
    """For every retained snapshot s, every file it references must be
    keep/alert — never delete."""
    m, s = tables
    plan = {r["path"]: r for r in vacuum_plan(m, s, CURRENT, RETAIN).collect()}
    manifest_rows = m.collect()
    for snap in range(CURRENT - RETAIN + 1, CURRENT + 1):
        for row in manifest_rows:
            referenced = row["added_seq"] <= snap and (
                row["deleted_seq"] is None or snap < row["deleted_seq"]
            )
            if referenced:
                assert plan[row["path"]]["action"] in ("keep", "alert")


def test_longer_retention_deletes_less(spark, tables):
    m, s = tables
    def deleted(retain):
        return {
            r["path"]
            for r in vacuum_plan(m, s, CURRENT, retain).collect()
            if r["action"] == "delete" and r["status"] == "expired"
        }
    for r1, r2 in [(1, 3), (3, 6), (6, 10)]:
        assert deleted(r2) <= deleted(r1)


def test_partition_invariance(spark, tables):
    m, s = tables
    a = vacuum_plan(m, s, CURRENT, RETAIN).collect()
    b = vacuum_plan(m.repartition(4), s.repartition(3), CURRENT, RETAIN).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_sql_twin_parity(spark, tables, tmp_path):
    import duckdb

    m, s = tables
    mp, sp = str(tmp_path / "m.parquet"), str(tmp_path / "s.parquet")
    m.write.mode("overwrite").parquet(mp)
    s.write.mode("overwrite").parquet(sp)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW manifest AS SELECT * FROM parquet_scan('{mp}/*.parquet')")
    con.execute(f"CREATE VIEW storage AS SELECT * FROM parquet_scan('{sp}/*.parquet')")
    want = sorted(
        map(tuple, con.execute(vacuum_plan_sql(CURRENT, RETAIN)).fetchall()),
        key=lambda t: t[0],
    )
    got = sorted(
        map(tuple, vacuum_plan(m, s, CURRENT, RETAIN).collect()),
        key=lambda t: t[0],
    )
    assert got == want
