"""Redirect-chain resolution (E119).

The 3xx records E118 surfaces form a pointer graph: every crawled
redirect names ONE target, and the frontier needs each chain's FINAL
url (that's the page identity all the dedup channels key on) plus a
loop verdict — redirect cycles are a classic trap variant the E100
scorer can't see because each individual url looks clean.

Distributed shape: pointer jumping, not a per-row walk — each round
joins the state relation with itself, composing ``f^(2^r)``, so
``max_hops`` is covered in ``ceil(log2(max_hops))`` rounds of one
hash join each (the E77/CC iteration discipline; a 32-hop policy is 5
rounds at any scale).  The twin replays the SAME ``f^max_hops``
composition as a naive hop-at-a-time recursive CTE — agreement proves
the doubling decomposition, hop counts included (a lut entry that
stopped early at a terminal carries its true hop count, so jumping
never overshoots).  A url still advanceable after ``max_hops`` is a
loop (or an over-long chain — policy-identical: don't follow).

Assumes the redirect relation is functional (one target per url) —
the shape HTTP gives; duplicate-source rows must be resolved upstream.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_HOPS = 8


def resolve_redirects(
    edges: DataFrame, max_hops: int = MAX_HOPS
) -> DataFrame:
    """edges(url, target) -> (url, final_url, hops, is_loop); final
    NULL when the chain is still advanceable after max_hops."""
    state = edges.select(
        "url", F.col("target").alias("cur"), F.lit(1).alias("hops")
    ).localCheckpoint(eager=True)
    rounds = max(1, math.ceil(math.log2(max_hops)))
    for _ in range(rounds):
        lut = state.select(
            F.col("url").alias("cur"),
            F.col("cur").alias("nxt"),
            F.col("hops").alias("add"),
        )
        state = state.join(lut, "cur", "left").select(
            "url",
            F.coalesce("nxt", "cur").alias("cur"),
            (F.col("hops") + F.coalesce("add", F.lit(0))).alias("hops"),
        )
        state = state.localCheckpoint(eager=True)
    srcs = edges.select("url").distinct().select(
        F.col("url").alias("cur"), F.lit(True).alias("advanceable")
    )
    return state.join(srcs, "cur", "left").select(
        "url",
        F.when(F.col("advanceable").isNull(), F.col("cur")).alias(
            "final_url"
        ),
        F.col("hops").cast("long").alias("hops"),
        F.coalesce("advanceable", F.lit(False)).alias("is_loop"),
    )


def resolve_redirects_sql(edges_sql: str, max_hops: int = MAX_HOPS) -> str:
    """DuckDB twin — naive hop-at-a-time recursive walk; ``edges_sql``
    SELECTs (url, target)."""
    return f"""
WITH RECURSIVE redges AS ({edges_sql}),
rsrc AS (SELECT DISTINCT url FROM redges),
walk(url, cur, hops) AS (
  SELECT url, target, 1 FROM redges
  UNION ALL
  SELECT w.url, e.target, w.hops + 1
  FROM walk w JOIN redges e ON e.url = w.cur
  WHERE w.hops < {max_hops}
),
last AS (
  SELECT url, cur, hops,
         row_number() OVER (PARTITION BY url ORDER BY hops DESC) AS rn
  FROM walk
)
SELECT url,
       CASE WHEN cur NOT IN (SELECT url FROM rsrc) THEN cur END
         AS final_url,
       hops::BIGINT AS hops,
       cur IN (SELECT url FROM rsrc) AS is_loop
FROM last WHERE rn = 1
"""
