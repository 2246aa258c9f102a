"""Recrawl scheduling (E110).

The decision the churn rollup (E84) and sitemap hints (E97) exist to
feed: how soon should each host be revisited?  Classic crawl-
scheduling rule (Cho & Garcia-Molina's uniform-vs-proportional result
reduced to an integer policy): start from the host's DECLARED cadence
(min sitemap ``changefreq`` mapped to days), then let OBSERVED churn
override it — a busy host (>= 1/3 of refetched pages changed) halves
its interval, a quiet host (< 10% changed) doubles it.  Hosts the
sitemap doesn't cover default to 14 days; hosts never refetched keep
their declared cadence (no evidence, no override).

Integer arithmetic end to end (cross-multiplied rate thresholds,
truncating halving with a floor of 1), so the twin is a hard check.
Shape: one groupBy(host) over the diff statuses (E84's rollup), one
groupBy(host) min over the seed hints, a full-outer host join — all
tiny per-host relations after the first aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mediaduplicatefinder_spark.operators.crawldiff import host_churn

DEFAULT_FREQ_DAYS = 14

# declared changefreq label -> days; unknown labels fall through to NULL
FREQ_DAYS = (
    ("hourly", 1),
    ("daily", 1),
    ("weekly", 7),
    ("monthly", 30),
    ("yearly", 365),
)


def _freq_expr():
    e = F
    expr = None
    col = F.lower(F.col("changefreq"))
    for label, days in FREQ_DAYS:
        cond = e.when(col == label, e.lit(days))
        expr = cond if expr is None else expr.when(col == label, e.lit(days))
    return expr  # unknown/NULL labels -> NULL (ignored by the min)


def recrawl_schedule(diff: DataFrame, seeds: DataFrame) -> DataFrame:
    """diff(url, host, status) x seeds(host, changefreq) -> per host
    (host, n_changed, n_unchanged, freq_days, revisit_days, tier)."""
    churn = host_churn(diff).select("host", "n_changed", "n_unchanged")
    freq = (
        seeds.select("host", _freq_expr().alias("fd"))
        .groupBy("host")
        .agg(F.min("fd").alias("freq_min"))
    )
    j = churn.join(freq, "host", "full_outer").select(
        "host",
        F.coalesce(F.col("n_changed"), F.lit(0)).alias("n_changed"),
        F.coalesce(F.col("n_unchanged"), F.lit(0)).alias("n_unchanged"),
        F.coalesce(F.col("freq_min"), F.lit(DEFAULT_FREQ_DAYS)).alias(
            "freq_days"
        ),
    )
    both = F.col("n_changed") + F.col("n_unchanged")
    busy = (both > 0) & (F.col("n_changed") * 3 >= both)
    quiet = (both > 0) & (F.col("n_changed") * 10 < both)
    revisit = (
        F.when(busy, F.greatest(F.expr("freq_days div 2"), F.lit(1)))
        .when(quiet, F.col("freq_days") * 2)
        .otherwise(F.col("freq_days"))
    )
    return j.select(
        "*",
        revisit.cast("long").alias("revisit_days"),
    ).select(
        "*",
        F.when(F.col("revisit_days") <= 3, F.lit("hot"))
        .when(F.col("revisit_days") <= 14, F.lit("warm"))
        .otherwise(F.lit("cold"))
        .alias("tier"),
    )


def recrawl_schedule_sql(diff_sql: str, seeds_sql: str) -> str:
    """DuckDB twin; ``diff_sql`` SELECTs (url, host, status),
    ``seeds_sql`` SELECTs (host, changefreq)."""
    freq_case = " ".join(
        f"WHEN '{label}' THEN {days}" for label, days in FREQ_DAYS
    )
    return f"""
WITH rdiff AS ({diff_sql}),
churn AS (
  SELECT host,
         sum(CASE WHEN status = 'CHANGED' THEN 1 ELSE 0 END)::BIGINT
           AS n_changed,
         sum(CASE WHEN status = 'UNCHANGED' THEN 1 ELSE 0 END)::BIGINT
           AS n_unchanged
  FROM rdiff GROUP BY host
),
freq AS (
  SELECT host,
         min(CASE lower(changefreq) {freq_case} END) AS freq_min
  FROM ({seeds_sql}) GROUP BY host
),
j AS (
  SELECT coalesce(c.host, f.host) AS host,
         coalesce(c.n_changed, 0)::BIGINT AS n_changed,
         coalesce(c.n_unchanged, 0)::BIGINT AS n_unchanged,
         coalesce(f.freq_min, {DEFAULT_FREQ_DAYS})::BIGINT AS freq_days
  FROM churn c FULL OUTER JOIN freq f ON c.host = f.host
),
sched AS (
  SELECT *,
         CASE
           WHEN n_changed + n_unchanged > 0
                AND n_changed * 3 >= n_changed + n_unchanged
             THEN greatest(freq_days // 2, 1)
           WHEN n_changed + n_unchanged > 0
                AND n_changed * 10 < n_changed + n_unchanged
             THEN freq_days * 2
           ELSE freq_days
         END::BIGINT AS revisit_days
  FROM j
)
SELECT host, n_changed, n_unchanged, freq_days, revisit_days,
       CASE WHEN revisit_days <= 3 THEN 'hot'
            WHEN revisit_days <= 14 THEN 'warm'
            ELSE 'cold' END AS tier
FROM sched
"""
