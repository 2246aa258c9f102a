"""E147 compaction planner: plan vs a pure-Python next-fit reference,
the bin-total bound, fixed-point idempotence after a simulated rewrite,
partition invariance, and the DuckDB twin."""

from __future__ import annotations

import pytest

from mediaduplicatefinder_spark.operators.compaction import (
    compaction_plan,
    compaction_plan_sql,
)

TARGET = 1000
SMALL = 500


def _reference(rows, target=TARGET, small=SMALL):
    """Pure-Python next-fit over (size desc, path) per partition."""
    out = {}
    parts = {}
    for part, path, size in rows:
        if size >= small:
            out[path] = (part, size, -1, 1, size, "keep")
        else:
            parts.setdefault(part, []).append((path, size))
    for part, fs in parts.items():
        fs.sort(key=lambda x: (-x[1], x[0]))
        prefix = 0
        bins = {}
        for path, size in fs:
            b = prefix // target
            bins.setdefault(b, []).append((path, size))
            prefix += size
        for b, members in bins.items():
            total = sum(s for _, s in members)
            act = "compact" if len(members) >= 2 else "keep"
            for path, size in members:
                out[path] = (part, size, b, len(members), total, act)
    return out


@pytest.fixture(scope="module")
def manifest(spark):
    # partition A: 7 small files spanning two bins + 1 large;
    # partition B: one lone small file (nothing to merge with);
    # partition C: exact-boundary sizes (ties on size, order by path)
    rows = (
        [("A", f"a{i}.parquet", 300 + 10 * i) for i in range(7)]
        + [("A", "abig.parquet", 5000)]
        + [("B", "b0.parquet", 120)]
        + [("C", "c0.parquet", 250), ("C", "c1.parquet", 250),
           ("C", "c2.parquet", 250), ("C", "c3.parquet", 250),
           ("C", "c4.parquet", 250)]
    )
    df = spark.createDataFrame(rows, "part string, path string, size_bytes long")
    return rows, df


def test_plan_matches_reference(spark, manifest):
    rows, df = manifest
    want = _reference(rows)
    got = {
        r["path"]: (r["part"], r["size_bytes"], r["bin"], r["bin_files"],
                    r["bin_bytes"], r["action"])
        for r in compaction_plan(df, "part", TARGET, SMALL).collect()
    }
    assert got == want
    assert got["abig.parquet"][5] == "keep"
    assert got["b0.parquet"][5] == "keep"  # singleton small file


def test_bin_total_bounded(spark, manifest):
    """Each compact bin's total <= target + one small file (the
    next-fit overflow bound: every member is < SMALL)."""
    _, df = manifest
    for r in compaction_plan(df, "part", TARGET, SMALL).collect():
        if r["action"] == "compact":
            assert r["bin_bytes"] <= TARGET + SMALL


def test_fixed_point_after_rewrite(spark, manifest):
    """Simulate executing the plan (each compact bin -> one merged
    file): re-planning the new manifest proposes zero further work."""
    rows, df = manifest
    plan = compaction_plan(df, "part", TARGET, SMALL).collect()
    new_rows = []
    seen_bins = set()
    for r in plan:
        if r["action"] == "keep":
            new_rows.append((r["part"], r["path"], r["size_bytes"]))
        elif (r["part"], r["bin"]) not in seen_bins:
            seen_bins.add((r["part"], r["bin"]))
            new_rows.append(
                (r["part"], f"merged-{r['part']}-{r['bin']}.parquet",
                 r["bin_bytes"])
            )
    df2 = spark.createDataFrame(
        new_rows, "part string, path string, size_bytes long"
    )
    again = compaction_plan(df2, "part", TARGET, SMALL).collect()
    assert all(r["action"] == "keep" for r in again)


def test_partition_invariance(spark, manifest):
    _, df = manifest
    a = compaction_plan(df, "part", TARGET, SMALL).collect()
    b = compaction_plan(df.repartition(5), "part", TARGET, SMALL).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_sql_twin_parity(spark, manifest, tmp_path):
    import duckdb

    _, df = manifest
    p = str(tmp_path / "files.parquet")
    df.write.mode("overwrite").parquet(p)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW files AS SELECT * FROM parquet_scan('{p}/*.parquet')"
    )
    want = sorted(
        map(tuple, con.execute(
            compaction_plan_sql("part", TARGET, SMALL)
        ).fetchall())
    )
    got = sorted(
        map(tuple, compaction_plan(df, "part", TARGET, SMALL).collect())
    )
    assert got == want
