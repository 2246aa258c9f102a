"""Z-order (Morton) data layout (E142): multi-dimensional file
clustering for scan pruning — the reason Delta's OPTIMIZE ZORDER and
Iceberg sort orders exist. At 100 TB, a predicate like
``user_id BETWEEN x AND y AND ts BETWEEN t1 AND t2`` prunes files via
min/max column stats; a time-ordered layout gives every file the FULL
user range (no pruning on user), a user-ordered one the full time
range. Interleaving the bits of both keys (Morton 1966) and splitting
on the z-value gives files that are near-square tiles in key space —
bounded min/max spans in BOTH dimensions at once.

Implementation is pure integer bit-math, whole-stage codegen, map-only:

- ranks must be ORDER-PRESERVING integers (hashing would destroy the
  locality being built): bounded ids as-is, timestamps as epoch
  offsets, open domains via quantile ranks from a sample (the CCNet
  broadcast-cutoff pattern) — here the caller passes rank expressions.
- ``part1by1`` spreads a 31-bit rank to even bit positions with the
  five classic magic-mask steps (no loop, no UDF); z = even(a) | odd(b)
  stays in 62 bits — never touches the int64 sign.
- file assignment = the z-value's top k bits (``n_files = 2^k``) —
  map-only and balanced when ranks fill their range uniformly; the
  production variant range-partitions on z-quantiles from a sample
  (same broadcast-constants shape), which this stands in for.

The report relation makes the pruning win MEASURABLE (and
oracle-checkable): per (layout, file) -> row count and the min/max
span of each dimension, for the z layout AND the naive row-order
layout side by side — the z files' per-dimension spans shrink by
~sqrt(n_files) while naive files span one whole dimension.

Reference tie-in: none (single-directory tool); SURVEY §2 E-series
extension — the write-side sibling of the partition/bucketing notes on
the dedup stores (incremental.py shard layout, E73).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MASKS = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)

MAX_RANK = (1 << 31) - 1


def part1by1(x: Column) -> Column:
    """Spread the low 31 bits of ``x`` to even bit positions (Morton
    magic masks) — an int64 expression chain, no UDF."""
    x = x.cast("long").bitwiseAND(F.lit(MAX_RANK))
    for shift, mask in _MASKS:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def zvalue(a_rank: Column, b_rank: Column) -> Column:
    """62-bit Morton code of two order-preserving 31-bit ranks."""
    return part1by1(a_rank).bitwiseOR(F.shiftleft(part1by1(b_rank), 1))


def zorder_file(a_rank: Column, b_rank: Column, k: int, rank_bits: int = 31) -> Column:
    """File id in [0, 2^k): the z-value's top k bits."""
    return F.shiftright(zvalue(a_rank, b_rank), 2 * rank_bits - k)


def layout_report(
    df: DataFrame,
    a_rank: Column,
    b_rank: Column,
    row_order: Column,
    k: int = 4,
    rank_bits: int = 31,
) -> DataFrame:
    """(layout, file_id, n_rows, a_span, b_span): per-file column-stat
    spans under the z layout vs the naive ``row_order``-chunked layout
    with the same file count — the pruning-win evidence relation.

    ``row_order`` must be an integer expression ranking rows in their
    natural write order (e.g. the event id); naive file =
    floor(order * 2^k / n_rows) needs n_rows, one tiny agg broadcast
    via crossJoin."""
    n_files = 1 << k
    base = df.select(
        a_rank.cast("long").alias("a"),
        b_rank.cast("long").alias("b"),
        row_order.cast("long").alias("ord"),
    )
    n = base.agg(F.count(F.lit(1)).alias("n_rows"))
    both = base.crossJoin(F.broadcast(n)).select(
        "a",
        "b",
        zorder_file(F.col("a"), F.col("b"), k, rank_bits).alias("z_file"),
        F.least(
            F.lit(n_files - 1).cast("long"),
            F.floor((F.col("ord") * n_files) / F.col("n_rows")).cast("long"),
        ).alias("naive_file"),
    )
    # melt via explode, NOT a union: the union branches re-execute the
    # shared child (scan + z computation) once per layout — the explode
    # is one pass (the hilbert.py report got the same fix)
    stacked = both.select(
        F.explode(
            F.array(
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
        "a",
        "b",
    ).select("lf.layout", "lf.file_id", "a", "b")
    return stacked.groupBy("layout", "file_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.max("a") - F.min("a")).alias("a_span"),
        (F.max("b") - F.min("b")).alias("b_span"),
    )


def layout_report_sql(
    k: int = 4,
    rank_bits: int = 31,
    a_expr: str = "user_id",
    b_expr: str = "CAST(epoch_us(ts) - epoch_us(TIMESTAMP '2024-01-01') AS BIGINT) // 1000000",
    ord_expr: str = "event_id",
    source: str = "events",
) -> str:
    """DuckDB twin — the same magic-mask spread written as SQL macros;
    agreement proves the bit math, file split, and span stats."""
    n_files = 1 << k
    expr = f"({{x}} & {MAX_RANK})"
    for shift, mask in _MASKS:
        expr = f"(({expr} | ({expr} << {shift})) & {mask})"
    spread_a = expr.format(x="a")
    spread_b = expr.format(x="b")
    return f"""WITH base AS (
  SELECT CAST({a_expr} AS BIGINT) AS a,
         CAST({b_expr} AS BIGINT) AS b,
         CAST({ord_expr} AS BIGINT) AS ord
  FROM {source}
),
n AS (SELECT COUNT(*) AS n_rows FROM base),
tiled AS (
  SELECT a, b,
         ({spread_a} | ({spread_b} << 1)) >> {2 * rank_bits - k} AS z_file,
         LEAST({n_files - 1}, (ord * {n_files}) // n.n_rows) AS naive_file
  FROM base, n
),
stacked AS (
  SELECT 'zorder' AS layout, z_file AS file_id, a, b FROM tiled
  UNION ALL
  SELECT 'roworder' AS layout, naive_file AS file_id, a, b FROM tiled
)
SELECT layout, file_id, COUNT(*)::BIGINT AS n_rows,
       (MAX(a) - MIN(a))::BIGINT AS a_span,
       (MAX(b) - MIN(b))::BIGINT AS b_span
FROM stacked GROUP BY 1, 2"""
