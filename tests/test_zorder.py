"""E142 Z-order layout: Morton-code bit math vs a pure-Python
reference, tile-locality guarantees vs the naive layout, file-split
bounds, partition invariance, and the DuckDB twin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mediaduplicatefinder_spark.operators.zorder import (
    MAX_RANK,
    layout_report,
    layout_report_sql,
    part1by1,
    zorder_file,
    zvalue,
)


def _ref_part1by1(x: int) -> int:
    x &= MAX_RANK
    out = 0
    for i in range(31):
        out |= ((x >> i) & 1) << (2 * i)
    return out


def _ref_z(a: int, b: int) -> int:
    return _ref_part1by1(a) | (_ref_part1by1(b) << 1)


def test_bit_math_matches_reference(spark):
    vals = [0, 1, 2, 3, 7, 8, 255, 4096, 123456789, MAX_RANK]
    rows = [(a, b) for a in vals for b in vals]
    df = spark.createDataFrame(rows, "a long, b long").select(
        "a",
        "b",
        part1by1(F.col("a")).alias("pa"),
        zvalue(F.col("a"), F.col("b")).alias("z"),
        zorder_file(F.col("a"), F.col("b"), 4).alias("f"),
    )
    for r in df.collect():
        assert r["pa"] == _ref_part1by1(r["a"])
        z = _ref_z(r["a"], r["b"])
        assert r["z"] == z
        assert r["f"] == z >> 58
        assert 0 <= r["f"] < 16
        assert r["z"] >= 0  # never touches the sign bit


def test_z_file_is_a_tile(spark):
    """With both ranks filling the full 31-bit range, the top-4-bit
    split cuts each dimension in four: every file's span in EACH
    dimension is <= 2^29 (a quarter of the range)."""
    n = 4096
    step = (MAX_RANK + 1) // 64
    rows = [(i * step, j * step) for i in range(64) for j in range(64)]
    assert len(rows) == n
    df = spark.createDataFrame(rows, "a long, b long")
    rep = layout_report(
        df, F.col("a"), F.col("b"), F.monotonically_increasing_id(), k=4
    )
    z = [r for r in rep.collect() if r["layout"] == "zorder"]
    assert len(z) == 16
    assert sum(r["n_rows"] for r in z) == n
    for r in z:
        assert r["a_span"] < (1 << 29)
        assert r["b_span"] < (1 << 29)


def test_beats_roworder_on_second_dimension(spark):
    """Time-ordered writes: the naive layout's files each span the
    entire user range; the z layout bounds both dimensions."""
    rows = [(i % 1000 * (MAX_RANK // 1000), i * (MAX_RANK // 4096), i) for i in range(4096)]
    df = spark.createDataFrame(rows, "a long, b long, ord long")
    rep = layout_report(df, F.col("a"), F.col("b"), F.col("ord"), k=4).collect()
    naive_a = max(r["a_span"] for r in rep if r["layout"] == "roworder")
    z_a = max(r["a_span"] for r in rep if r["layout"] == "zorder")
    assert naive_a > MAX_RANK * 0.9  # no pruning on dimension a
    assert z_a <= MAX_RANK // 2  # bounded tile
    files = {r["file_id"] for r in rep if r["layout"] == "roworder"}
    assert files == set(range(16))


def test_partition_invariance(spark):
    rows = [((i * 37) % 5000, (i * 91) % 7000, i) for i in range(2000)]
    df = spark.createDataFrame(rows, "a long, b long, ord long")
    a = layout_report(df, F.col("a"), F.col("b"), F.col("ord"), k=3).collect()
    b = layout_report(
        df.repartition(11), F.col("a"), F.col("b"), F.col("ord"), k=3
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_sql_twin_parity(spark, tmp_path):
    import datetime as dt

    import duckdb

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(seconds=i * 137), (i * 7) % 50)
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long")
    p = str(tmp_path / "events.parquet")
    df.write.mode("overwrite").parquet(p)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM parquet_scan('{p}/*.parquet')"
    )
    sql = layout_report_sql(k=4, b_expr="epoch_us(ts) // 1000000 - 1704067200")
    want = sorted(map(tuple, con.execute(sql).fetchall()))
    got = sorted(
        map(
            tuple,
            layout_report(
                df,
                F.col("user_id"),
                F.col("ts").cast("long") - F.lit(1704067200),
                F.col("event_id"),
                k=4,
            ).collect(),
        )
    )
    assert got == want
