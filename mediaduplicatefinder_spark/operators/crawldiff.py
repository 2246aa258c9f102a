"""Crawl snapshot diff (E84).

Incremental crawling lives on the delta between two snapshots of the
same url space: which pages are NEW, which CHANGED (same url, different
content), which are UNCHANGED (re-fetch wasted), which are GONE.  The
E51 snapshot-dedup operator picks a winner per url; this one emits the
per-url transition table plus the per-host churn rollup a recrawl
scheduler consumes (hosts with high change-rate get shorter revisit
intervals — the classic crawl-scheduling signal).

Shape: ONE full-outer join keyed on url between the two snapshot
relations, each reduced to (url, host, content key) first.  Content
identity is ``sha2(text)`` — the engine's exact-dup channel (A1), so
"changed" means byte-different extracted text, not a float score.  At
10^12 urls both sides are Iceberg-partitioned by url-hash bucket, so
the join co-locates without a shuffle of the raw text (only 40-byte
keys move here).

Status rules (mirrored verbatim in the twin):
  NEW       url only in the new snapshot
  GONE      url only in the old snapshot
  CHANGED   both, sha differs
  UNCHANGED both, sha equal
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _keyed(df: DataFrame, text_col: str) -> DataFrame:
    return df.select(
        "url",
        "host",
        F.sha2(F.col(text_col), 256).alias("sha"),
    )


def crawl_diff(
    old: DataFrame, new: DataFrame, text_col: str = "text"
) -> DataFrame:
    """old/new(url, host, text) -> (url, host, status)."""
    o = _keyed(old, text_col).select(
        "url", F.col("host").alias("host_o"), F.col("sha").alias("sha_o")
    )
    n = _keyed(new, text_col).select(
        "url", F.col("host").alias("host_n"), F.col("sha").alias("sha_n")
    )
    j = o.join(n, "url", "full_outer")
    status = (
        F.when(F.col("sha_o").isNull(), F.lit("NEW"))
        .when(F.col("sha_n").isNull(), F.lit("GONE"))
        .when(F.col("sha_o") == F.col("sha_n"), F.lit("UNCHANGED"))
        .otherwise(F.lit("CHANGED"))
    )
    return j.select(
        "url",
        F.coalesce("host_n", "host_o").alias("host"),
        status.alias("status"),
    )


def host_churn(diff: DataFrame) -> DataFrame:
    """(url, host, status) -> per-host churn rollup with change_rate =
    changed / seen-in-both (round 6; hosts with no overlap -> 0)."""
    agg = diff.groupBy("host").agg(
        F.sum(F.when(F.col("status") == "NEW", 1).otherwise(0))
        .cast("long")
        .alias("n_new"),
        F.sum(F.when(F.col("status") == "GONE", 1).otherwise(0))
        .cast("long")
        .alias("n_gone"),
        F.sum(F.when(F.col("status") == "CHANGED", 1).otherwise(0))
        .cast("long")
        .alias("n_changed"),
        F.sum(F.when(F.col("status") == "UNCHANGED", 1).otherwise(0))
        .cast("long")
        .alias("n_unchanged"),
    )
    both = F.col("n_changed") + F.col("n_unchanged")
    return agg.select(
        "host",
        "n_new",
        "n_gone",
        "n_changed",
        "n_unchanged",
        F.when(both > 0, F.round(F.col("n_changed") / both, 6))
        .otherwise(F.lit(0.0))
        .alias("change_rate"),
    )


def crawl_diff_churn_sql(old_sql: str, new_sql: str) -> str:
    """DuckDB twin of crawl_diff |> host_churn."""
    return f"""
WITH oldsnap AS ({old_sql}),
newsnap AS ({new_sql}),
o AS (SELECT url, host AS host_o, sha256(text) AS sha_o FROM oldsnap),
n AS (SELECT url, host AS host_n, sha256(text) AS sha_n FROM newsnap),
d AS (
  SELECT coalesce(n.url, o.url) AS url,
         coalesce(n.host_n, o.host_o) AS host,
         CASE WHEN o.sha_o IS NULL THEN 'NEW'
              WHEN n.sha_n IS NULL THEN 'GONE'
              WHEN o.sha_o = n.sha_n THEN 'UNCHANGED'
              ELSE 'CHANGED' END AS status
  FROM o FULL OUTER JOIN n ON o.url = n.url
),
agg AS (
  SELECT host,
         sum(CASE WHEN status = 'NEW' THEN 1 ELSE 0 END)::BIGINT AS n_new,
         sum(CASE WHEN status = 'GONE' THEN 1 ELSE 0 END)::BIGINT AS n_gone,
         sum(CASE WHEN status = 'CHANGED' THEN 1 ELSE 0 END)::BIGINT
           AS n_changed,
         sum(CASE WHEN status = 'UNCHANGED' THEN 1 ELSE 0 END)::BIGINT
           AS n_unchanged
  FROM d GROUP BY host
)
SELECT host, n_new, n_gone, n_changed, n_unchanged,
       CASE WHEN n_changed + n_unchanged > 0
            THEN round(n_changed / (n_changed + n_unchanged), 6)
            ELSE 0.0 END AS change_rate
FROM agg
"""
