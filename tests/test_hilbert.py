"""Hilbert-curve layout (operators/hilbert.py): DFA tables vs the
classic rotation loop, curve continuity, Spark walk vs python walk,
SQL twin agreement."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from mediaduplicatefinder_spark.operators.hilbert import (
    HILBERT_NEXT,
    HILBERT_OUT,
    hilbert_layout_report,
    hilbert_layout_sql,
    with_hilbert_index,
)


def _xy2d_loop(bits: int, x: int, y: int) -> int:
    d = 0
    s = 1 << (bits - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def _table_walk(bits: int, x: int, y: int) -> int:
    st, d = 0, 0
    for i in range(bits - 1, -1, -1):
        idx = st * 4 + ((x >> i) & 1) * 2 + ((y >> i) & 1)
        d = d * 4 + HILBERT_OUT[idx]
        st = HILBERT_NEXT[idx]
    return d


def test_dfa_matches_rotation_loop_exhaustively():
    bits = 6
    for x in range(1 << bits):
        for y in range(1 << bits):
            assert _table_walk(bits, x, y) == _xy2d_loop(bits, x, y)


def test_curve_is_continuous():
    # the defining Hilbert property Morton lacks: consecutive indices
    # are edge-adjacent cells (L1 distance exactly 1)
    bits = 5
    inv = {}
    for x in range(1 << bits):
        for y in range(1 << bits):
            inv[_table_walk(bits, x, y)] = (x, y)
    assert len(inv) == 1 << (2 * bits)  # bijection
    for d in range(1, 1 << (2 * bits)):
        (x0, y0), (x1, y1) = inv[d - 1], inv[d]
        assert abs(x0 - x1) + abs(y0 - y1) == 1


def test_spark_walk_matches_python(spark):
    bits = 8
    pts = [(x, y) for x in range(0, 256, 17) for y in range(0, 256, 23)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {
        (r["x"], r["y"]): r["hilbert_d"]
        for r in with_hilbert_index(df, "x", "y", bits=bits).collect()
    }
    for x, y in pts:
        assert got[(x, y)] == _table_walk(bits, x, y)


def test_report_sql_twin_matches(spark):
    rows = [
        (i, 1 + (i * 37) % 900, (i * 211) % 100_000) for i in range(400)
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, secs long")
    got = sorted(
        tuple(r)
        for r in hilbert_layout_report(
            df,
            F.col("user_id"),
            F.col("secs"),
            F.col("event_id"),
            bits=8,
            k=4,
        ).collect()
    )
    con = duckdb.connect()
    con.register("events", df.toPandas())
    want = sorted(
        (str(layout), int(f), int(n), int(xs), int(ys))
        for layout, f, n, xs, ys in con.execute(
            hilbert_layout_sql(
                bits=8, k=4, a_expr="user_id", b_expr="secs",
                ord_expr="event_id",
            )
        ).fetchall()
    )
    assert got == want
    layouts = {t[0] for t in got}
    assert layouts == {"hilbert", "zorder", "roworder"}
