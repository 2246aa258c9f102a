"""Count-min sketch (E135): mergeable heavy-hitter counting —
the frequency sibling of the HLL/KMV cardinality sketches (E75,
operators/sketches.py), completing the corpus-monitoring sketch
family.

Published structure (Cormode & Muthukrishnan, J. Algorithms 2005): a
``d x w`` counter grid; item ``x`` with weight ``c`` adds ``c`` to
``row j, column h_j(x) mod w`` for each of the ``d`` independent
hashes; the point-query estimate is ``min_j grid[j][h_j(x)]`` — an
overestimate with error <= eps*N at probability 1-delta for
``w = e/eps, d = ln(1/delta)``.

Why it matters at 100 TB: "which boilerplate lines / shingles / hosts
dominate this crawl" is a heavy-hitter query over trillions of items;
exact counts shuffle every distinct key, while the CMS shuffles at
most ``d*w`` integer cells per group — map-side combine does the rest,
and grids from different snapshots MERGE by cell-wise addition (tested)
exactly like the HLL register tables.

Cross-engine determinism: ``h_j(x)`` = the repo's md5-60-bit idiom over
``j || '|' || x`` (the hamming_pairs/supershingle hash), so the DuckDB
twin rebuilds the grid cell-for-cell; the estimate is an integer min —
no floats anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CMS_D = 4
CMS_W = 64


def _hj(item: Column, j: Column | int, w: int) -> Column:
    jc = (F.lit(j) if isinstance(j, int) else j).cast("string")
    h = F.conv(
        F.substring(F.md5(F.concat_ws("|", jc, item)), 1, 15),
        16, 10,
    ).cast("long")
    return F.pmod(h, F.lit(w))


def cms_build(
    items: DataFrame,
    item_col: str = "item",
    weight_col: str | None = None,
    group_cols: list[str] | None = None,
    d: int = CMS_D,
    w: int = CMS_W,
) -> DataFrame:
    """(group_cols..., j, col, cnt) — the counter grid; at most d*w
    rows per group reach the shuffle (map-side partial sum)."""
    group_cols = group_cols or []
    wcol = (
        F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    )
    return (
        items.select(
            *group_cols,
            F.col(item_col).alias("__it"),
            wcol.alias("__w"),
            F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("j"),
        )
        .select(
            *group_cols,
            "j",
            _hj(F.col("__it"), F.col("j"), w).alias("col"),
            "__w",
        )
        .groupBy(*group_cols, "j", "col")
        .agg(F.sum("__w").alias("cnt"))
    )


def cms_merge(grids: DataFrame, group_cols: list[str] | None = None) -> DataFrame:
    """Union of grids -> one grid: cell-wise addition (the mergeability
    that lets snapshots sketch independently)."""
    group_cols = group_cols or []
    return grids.groupBy(*group_cols, "j", "col").agg(
        F.sum("cnt").alias("cnt")
    )


def cms_estimate(
    grid: DataFrame,
    probes: DataFrame,
    item_col: str = "item",
    group_cols: list[str] | None = None,
    d: int = CMS_D,
    w: int = CMS_W,
) -> DataFrame:
    """(group_cols..., item, est) — min over the d probed cells.  The
    grid is d*w rows per group: always broadcast-side."""
    group_cols = group_cols or []
    probed = probes.select(
        *group_cols,
        F.col(item_col).alias("item"),
        F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("j"),
    ).withColumn("col", _hj(F.col("item"), F.col("j"), w))
    on = ["j", "col", *group_cols]
    return (
        probed.join(F.broadcast(grid), on, "left")
        .groupBy(*group_cols, "item")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).cast("long").alias("est"))
    )


def cms_sql(
    items_sql: str,
    d: int = CMS_D,
    w: int = CMS_W,
) -> str:
    """DuckDB twin: builds the grid over ``items_sql`` (columns
    ``item``, ``wt``) and returns (item, est, exact) for every distinct
    item — ``est >= exact`` is the CMS guarantee and the oracle's
    cross-check."""
    h = (
        "('0x' || substr(md5(j.j::VARCHAR || '|' || {x}), 1, 15))::BIGINT"
        f" % {w}"
    )
    return f"""
WITH items AS ({items_sql}),
js AS (SELECT unnest(range(0, {d})) AS j),
grid AS (
  SELECT j.j, {h.format(x='items.item')} AS col,
         sum(items.wt)::BIGINT AS cnt
  FROM items, js j
  GROUP BY j.j, {h.format(x='items.item')}
),
distinct_items AS (
  SELECT item, sum(wt)::BIGINT AS exact FROM items GROUP BY item
),
probe AS (
  SELECT di.item, di.exact, j.j,
         {h.format(x='di.item')} AS col
  FROM distinct_items di, js j
)
SELECT p.item, min(g.cnt)::BIGINT AS est, p.exact
FROM probe p JOIN grid g ON g.j = p.j AND g.col = p.col
GROUP BY p.item, p.exact
"""
