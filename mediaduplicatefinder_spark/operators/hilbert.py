"""Hilbert-curve data layout (E203): the locality-optimal companion of
the Z-order tiling (zorder.py, E142) — Hilbert, "Über die stetige
Abbildung einer Linie auf ein Flächenstück" (1891); state-machine
formulation after Lawder/King and Hamilton's compact Hilbert indices.

Why beside Z-order: both map a 2-D key grid onto a 1-D file order so
min/max column stats prune in BOTH dimensions, but Morton's bit
interleave takes 3 long diagonal jumps per recursion level (the
"Z" strokes), giving some files a span far larger than their row
count implies; the Hilbert traversal is ADJACENT at every step (each
successive cell shares an edge), so file tiles are connected regions
with strictly tighter worst-case spans.  Iceberg and Delta both grew
Hilbert options next to their Z-order for exactly this reason.  The
report relation makes the claim measurable instead of asserted:
per-file span stats for hilbert / zorder / roworder over the SAME
quantized grid.

Implementation is the 4-state DFA equivalent of the classic xy2d
rotation loop, derived programmatically at import (closure of the
rotation group over bit-pair transforms, _derive_dfa) and pinned by a
pytest that replays the loop exhaustively.  Per MSB level: consume one
bit of x and one of y, emit a base-4 digit, transition — so the Spark
side is ``bits`` chained projections of element_at() on two 16-entry
literal arrays (whole-stage codegen, no UDF; withColumn per round
keeps the expression tree LINEAR in ``bits`` — a nested fold would
double the state subtree every level), and the DuckDB twin is the same
rounds as chained CTEs.  Grid quantization from min/max (one tiny agg
broadcast, the zorder n_rows pattern) uses pure BIGINT math in both
engines.

Reference tie-in: none (single-directory tool); SURVEY §2 E-series
extension — write-side sibling of E142.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mediaduplicatefinder_spark.operators.zorder import zorder_file


def _derive_dfa() -> tuple[list[int], list[int]]:
    """Close the xy2d rotation group over bit-pair transforms: state =
    the affine transform mapping raw (bx, by) to the effective frame;
    step emits digit (3*rx)^ry and composes the level's rotation."""

    def rot(rx: int, ry: int):
        if ry == 0:
            if rx == 1:
                return lambda p: (1 - p[1], 1 - p[0])
            return lambda p: (p[1], p[0])
        return lambda p: p

    def key(f):
        return tuple(f((bx, by)) for bx in (0, 1) for by in (0, 1))

    ident = lambda p: p  # noqa: E731
    states = {key(ident): 0}
    funcs = [ident]
    out: dict[tuple[int, int, int], int] = {}
    nxt: dict[tuple[int, int, int], int] = {}
    frontier = [ident]
    while frontier:
        T = frontier.pop()
        si = states[key(T)]
        for bx in (0, 1):
            for by in (0, 1):
                rx, ry = T((bx, by))
                R = rot(rx, ry)
                T2 = lambda p, R=R, T=T: R(T(p))  # noqa: E731
                k = key(T2)
                if k not in states:
                    states[k] = len(funcs)
                    funcs.append(T2)
                    frontier.append(T2)
                out[(si, bx, by)] = (3 * rx) ^ ry
                nxt[(si, bx, by)] = states[k]
    n = len(funcs)
    flat_out = [out[(s, i >> 1, i & 1)] for s in range(n) for i in range(4)]
    flat_nxt = [nxt[(s, i >> 1, i & 1)] for s in range(n) for i in range(4)]
    return flat_out, flat_nxt


HILBERT_OUT, HILBERT_NEXT = _derive_dfa()  # 4 states x 4 inputs


def with_hilbert_index(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bits: int = 8,
    out_col: str = "hilbert_d",
) -> DataFrame:
    """Appends ``out_col`` = Hilbert index (2*bits bits) of the integer
    grid coords in [0, 2^bits).  One chained projection per MSB level;
    temp state/digit columns are dropped."""
    out_arr = F.array(*[F.lit(v) for v in HILBERT_OUT])
    nxt_arr = F.array(*[F.lit(v) for v in HILBERT_NEXT])
    st = "__h_state"
    df = df.withColumn(st, F.lit(0)).withColumn(out_col, F.lit(0).cast("long"))
    for i in range(bits - 1, -1, -1):
        idx = (
            F.col(st) * 4
            + F.shiftright(F.col(x_col), i).bitwiseAND(F.lit(1)) * 2
            + F.shiftright(F.col(y_col), i).bitwiseAND(F.lit(1))
            + 1  # element_at is 1-based
        )
        df = df.withColumn("__h_idx", idx.cast("int"))
        df = df.withColumn(
            out_col,
            F.col(out_col) * 4 + F.element_at(out_arr, F.col("__h_idx")),
        ).withColumn(st, F.element_at(nxt_arr, F.col("__h_idx")))
    return df.drop(st, "__h_idx")


def hilbert_layout_report(
    df: DataFrame,
    a_rank: Column,
    b_rank: Column,
    row_order: Column,
    bits: int = 8,
    k: int = 4,
) -> DataFrame:
    """(layout, file_id, n_rows, x_span, y_span) for layout in
    {hilbert, zorder, roworder} over the SAME [0,2^bits)^2 quantized
    grid and the same 2^k file count — spans in grid units, so the
    numbers compare curve against curve at identical quantization."""
    n_files = 1 << k
    base = df.select(
        a_rank.cast("long").alias("a"),
        b_rank.cast("long").alias("b"),
        row_order.cast("long").alias("ord"),
    )
    mm = base.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("a").alias("min_a"),
        F.max("a").alias("max_a"),
        F.min("b").alias("min_b"),
        F.max("b").alias("max_b"),
    )
    gridded = base.crossJoin(F.broadcast(mm)).select(
        "ord",
        "n_rows",
        F.expr(f"((a - min_a) * {1 << bits}) div (max_a - min_a + 1)").alias(
            "x"
        ),
        F.expr(f"((b - min_b) * {1 << bits}) div (max_b - min_b + 1)").alias(
            "y"
        ),
    )
    both = with_hilbert_index(gridded, "x", "y", bits=bits).select(
        "x",
        "y",
        F.shiftright(F.col("hilbert_d"), 2 * bits - k).alias("h_file"),
        zorder_file(F.col("x"), F.col("y"), k, rank_bits=bits).alias("z_file"),
        # integer div, not floor(double /): the twin computes
        # (ord * n) // n_rows in BIGINT, and ord*n >= 2^53 would lose
        # low bits in the double path and land in a different file
        # bucket (review r5 — the module's pure-BIGINT contract)
        F.least(
            F.lit(n_files - 1).cast("long"),
            F.expr(f"(ord * {n_files}) div n_rows"),
        ).alias("naive_file"),
    )
    # melt via explode, NOT a 3-way union: union branches re-execute the
    # shared child (scan + grid + index walk) once per layout — the
    # explode is one pass (plan-audited: single FileScan)
    stacked = both.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("hilbert").alias("layout"),
                    F.col("h_file").alias("file_id"),
                ),
                F.struct(
                    F.lit("zorder").alias("layout"),
                    F.col("z_file").alias("file_id"),
                ),
                F.struct(
                    F.lit("roworder").alias("layout"),
                    F.col("naive_file").alias("file_id"),
                ),
            )
        ).alias("lf"),
        "x",
        "y",
    ).select("lf.layout", "lf.file_id", "x", "y")
    return stacked.groupBy("layout", "file_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.max("x") - F.min("x")).alias("x_span"),
        (F.max("y") - F.min("y")).alias("y_span"),
    )


def hilbert_layout_sql(
    bits: int = 8,
    k: int = 4,
    a_expr: str = "user_id",
    b_expr: str = (
        "CAST(epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01') AS BIGINT)"
        " // 1000000"
    ),
    ord_expr: str = "event_id",
    source: str = "events",
) -> str:
    """DuckDB twin: identical quantization, the same DFA tables walked
    as one chained CTE per MSB level, the same Morton spread macro for
    the zorder rows."""
    from mediaduplicatefinder_spark.operators.zorder import _MASKS, MAX_RANK

    n_files = 1 << k
    out_lit = "[" + ", ".join(str(v) for v in HILBERT_OUT) + "]"
    nxt_lit = "[" + ", ".join(str(v) for v in HILBERT_NEXT) + "]"
    spread = f"({{x}} & {MAX_RANK})"
    for shift, mask in _MASKS:
        spread = f"(({spread} | ({spread} << {shift})) & {mask})"
    rounds = []
    prev = "h_init"
    for rno, i in enumerate(range(bits - 1, -1, -1)):
        rounds.append(
            f"""h{rno} AS (
  SELECT * REPLACE (
    hd * 4 + ({out_lit})[st * 4 + ((x >> {i}) & 1) * 2 + ((y >> {i}) & 1) + 1]
      AS hd,
    ({nxt_lit})[st * 4 + ((x >> {i}) & 1) * 2 + ((y >> {i}) & 1) + 1] AS st
  ) FROM {prev}
)"""
        )
        prev = f"h{rno}"
    rounds_sql = ",\n".join(rounds)
    return f"""WITH base AS (
  SELECT CAST({a_expr} AS BIGINT) AS a,
         CAST({b_expr} AS BIGINT) AS b,
         CAST({ord_expr} AS BIGINT) AS ord
  FROM {source}
),
mm AS (
  SELECT COUNT(*) AS n_rows,
         MIN(a) AS min_a, MAX(a) AS max_a,
         MIN(b) AS min_b, MAX(b) AS max_b
  FROM base
),
h_init AS (
  SELECT ord, n_rows,
         ((a - min_a) * {1 << bits}) // (max_a - min_a + 1) AS x,
         ((b - min_b) * {1 << bits}) // (max_b - min_b + 1) AS y,
         0 AS st, 0::BIGINT AS hd
  FROM base, mm
),
{rounds_sql},
tiled AS (
  SELECT x, y,
         hd >> {2 * bits - k} AS h_file,
         ({spread.format(x="x")} | ({spread.format(x="y")} << 1))
           >> {2 * bits - k} AS z_file,
         LEAST({n_files - 1}, (ord * {n_files}) // n_rows) AS naive_file
  FROM {prev}
),
stacked AS (
  SELECT 'hilbert' AS layout, h_file AS file_id, x, y FROM tiled
  UNION ALL
  SELECT 'zorder' AS layout, z_file AS file_id, x, y FROM tiled
  UNION ALL
  SELECT 'roworder' AS layout, naive_file AS file_id, x, y FROM tiled
)
SELECT layout, file_id, COUNT(*)::BIGINT AS n_rows,
       (MAX(x) - MIN(x))::BIGINT AS x_span,
       (MAX(y) - MIN(y))::BIGINT AS y_span
FROM stacked GROUP BY 1, 2"""
