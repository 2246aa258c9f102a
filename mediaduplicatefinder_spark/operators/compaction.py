"""Small-file compaction planner (E147): the Iceberg/Delta
``OPTIMIZE``/``rewrite_data_files`` bin-packing decision as a
first-class deterministic relation.

Why this belongs in a 100 TB engine: every long-lived table the
pipeline writes (signature stores, incremental ledgers, per-snapshot
dedup outputs) accretes small files — streaming micro-batches, skewed
partitions, retraction rewrites — and scan cost degrades with file
count, not bytes (task scheduling, footer reads, no intra-file
parallelism to amortize). The fix is periodic compaction, and the
expensive part is the REWRITE, so the PLAN must be computable from
the table's file manifest alone: O(files) rows, never the corpus.

Plan shape (what the production engines actually do — next-fit over a
deterministic order, not optimal bin packing, because at file grain
optimality is irrelevant and determinism/idempotence are not):

1. files at or above ``small_bytes`` are already right-sized: ``keep``;
2. per table partition, order small files by (size desc, path) — the
   first-fit-decreasing flavor that minimizes boundary overflow;
3. EXCLUSIVE prefix sum of sizes over that order (ROWS frame pinned,
   the E48 packing lesson); ``bin = prefix div target_bytes`` — each
   bin's total is bounded by ``target_bytes`` + one file;
4. a bin with one file has nothing to merge with: ``keep``; bins with
   >= 2 files become one rewrite task each: ``compact``.

Everything is integer window/group math over the manifest relation —
whole-stage codegen, one shuffle on the partition key (the same
exchange any manifest scan groups by), and the twin SQL matches bit
for bit. Rerunning the planner on the post-compaction manifest is a
fixed point: every merged file lands at or above ``small_bytes``
(unless a partition's ENTIRE small tail is below it, which the
``bin_bytes`` column exposes).

Reference tie-in: none (single directory scan, no table maintenance);
SURVEY §2 E-series extension — the storage-layout sibling of the
Z-order report (E142) and shard layout (E90-series): zorder decides
row order, sharding decides placement, compaction decides file grain.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def compaction_plan(
    files: DataFrame,
    part_col: str,
    target_bytes: int,
    small_bytes: int | None = None,
) -> DataFrame:
    """(part, path, size_bytes, bin, bin_files, bin_bytes, action):
    each manifest row routed to ``keep`` or ``compact`` with its
    rewrite-task bin. ``files`` must carry (part_col, path,
    size_bytes); ``small_bytes`` defaults to ``target_bytes // 2``
    (files above it are not worth rewriting)."""
    if small_bytes is None:
        small_bytes = target_bytes // 2
    base = files.select(
        F.col(part_col).cast("string").alias("part"),
        F.col("path").cast("string").alias("path"),
        F.col("size_bytes").cast("long").alias("size_bytes"),
    )
    # exclusive prefix sum: ROWS frame pinned explicitly so duplicate
    # (size, path) peers can never widen it (the E48 RANGE-frame lesson)
    small = base.filter(F.col("size_bytes") < small_bytes).select(
        "part",
        "path",
        "size_bytes",
        F.expr(
            f"coalesce(sum(size_bytes) over (partition by part "
            f"order by size_bytes desc, path "
            f"rows between unbounded preceding and 1 preceding), 0) "
            f"div {target_bytes}"
        ).alias("bin"),
    )
    binw = Window.partitionBy("part", "bin")
    small = small.select(
        "part",
        "path",
        "size_bytes",
        "bin",
        F.count(F.lit(1)).over(binw).alias("bin_files"),
        F.sum("size_bytes").over(binw).alias("bin_bytes"),
        F.when(F.count(F.lit(1)).over(binw) >= 2, F.lit("compact"))
        .otherwise(F.lit("keep"))
        .alias("action"),
    )
    large = base.filter(F.col("size_bytes") >= small_bytes).select(
        "part",
        "path",
        "size_bytes",
        F.lit(-1).cast("long").alias("bin"),
        F.lit(1).cast("long").alias("bin_files"),
        F.col("size_bytes").alias("bin_bytes"),
        F.lit("keep").alias("action"),
    )
    return small.unionByName(large)


def compaction_plan_sql(
    part_col: str,
    target_bytes: int,
    small_bytes: int | None = None,
    source: str = "files",
) -> str:
    """DuckDB twin — same order, same exclusive ROWS frame, same
    integer division."""
    if small_bytes is None:
        small_bytes = target_bytes // 2
    return f"""WITH base AS (
  SELECT CAST({part_col} AS VARCHAR) AS part,
         CAST(path AS VARCHAR) AS path,
         CAST(size_bytes AS BIGINT) AS size_bytes
  FROM {source}
),
small AS (
  SELECT part, path, size_bytes,
         CAST(COALESCE(SUM(size_bytes) OVER (
           PARTITION BY part ORDER BY size_bytes DESC, path
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           // {target_bytes} AS BIGINT) AS bin
  FROM base WHERE size_bytes < {small_bytes}
),
binned AS (
  SELECT part, path, size_bytes, bin,
         COUNT(*) OVER (PARTITION BY part, bin) AS bin_files,
         CAST(SUM(size_bytes) OVER (PARTITION BY part, bin) AS BIGINT)
           AS bin_bytes
  FROM small
)
SELECT part, path, size_bytes, bin, bin_files, bin_bytes,
       CASE WHEN bin_files >= 2 THEN 'compact' ELSE 'keep' END AS action
FROM binned
UNION ALL
SELECT part, path, size_bytes,
       CAST(-1 AS BIGINT) AS bin, CAST(1 AS BIGINT) AS bin_files,
       size_bytes AS bin_bytes, 'keep' AS action
FROM base WHERE size_bytes >= {small_bytes}"""
