"""Per-host health rollup (E106).

Crawl scheduling is a HOST-level decision: a host whose pages are
mostly boilerplate, soft-404s, trap urls, or canonical-duplicate
losers should lose crawl budget long before per-page filtering runs.
This operator composes the session's page-level channels — template
heaviness (E99), soft-404 flags (E101), trap scoring (E100) on the
crawled urls, canonical families (E98) — and rolls them up to one row
per host with an integer penalty and a ``healthy`` verdict
(``penalty * 5 <= n_pages``, i.e. a weighted defect rate under 20%).

Shape: the four channel plans share one persisted scan of the pages
input (the session's re-derivation lesson), join back on their page
keys, and collapse in ONE host aggregation.  Every channel is itself
linear; the rollup adds two co-partitioned joins and a groupBy(host).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mediaduplicatefinder_spark.functions.trapurl import (
    trap_url_scores,
    trap_url_scores_sql,
)
from mediaduplicatefinder_spark.operators.canonical import (
    canonical_collapse,
    canonical_collapse_sql,
)
from mediaduplicatefinder_spark.operators.hosttemplate import (
    host_template_stats,
    host_template_stats_sql,
)
from mediaduplicatefinder_spark.operators.soft404 import (
    soft404_flags,
    soft404_flags_sql,
)


def host_health(pages: DataFrame) -> DataFrame:
    """pages(host, doc_id, url, text, html) -> one row per host:
    (host, n_pages, n_boiler, n_soft404, n_trap, n_dup_losers,
    penalty, healthy)."""
    pages = pages.persist()  # four channel plans share the scan
    ht = host_template_stats(pages.select("host", "doc_id", "text"))
    s4 = soft404_flags(pages.select("host", "doc_id", "text"))
    tr = trap_url_scores(pages.select("url")).select("url", "is_trap")
    cc = canonical_collapse(pages.select("url", "html")).select(
        "url", "is_winner", "group_size"
    )
    per = (
        pages.select("host", "doc_id", "url")
        .join(
            ht.select("host", "doc_id", "boilerplate_heavy"),
            ["host", "doc_id"],
        )
        .join(s4.select("host", "doc_id", "is_soft404"), ["host", "doc_id"])
        .join(tr, "url")
        .join(cc, "url")
    )
    b = lambda c: F.sum(c.cast("long"))  # noqa: E731
    agg = per.groupBy("host").agg(
        F.count(F.lit(1)).alias("n_pages"),
        b(F.col("boilerplate_heavy")).alias("n_boiler"),
        b(F.col("is_soft404")).alias("n_soft404"),
        b(F.col("is_trap")).alias("n_trap"),
        b((F.col("group_size") > 1) & ~F.col("is_winner")).alias(
            "n_dup_losers"
        ),
    )
    penalty = (
        F.lit(2) * F.col("n_trap")
        + F.col("n_soft404")
        + F.col("n_boiler")
        + F.col("n_dup_losers")
    )
    return agg.select(
        "*",
        penalty.alias("penalty"),
        (penalty * 5 <= F.col("n_pages")).alias("healthy"),
    )


def host_health_sql(pages_sql: str) -> str:
    """DuckDB twin; ``pages_sql`` SELECTs (host, doc_id, url, text,
    html) — composes the four channel twins as subqueries."""
    return f"""
WITH hhp AS ({pages_sql}),
hht AS (
  SELECT host, doc_id, boilerplate_heavy
  FROM ({host_template_stats_sql("SELECT host, doc_id, text FROM hhp")})
),
hhs AS (
  SELECT host, doc_id, is_soft404
  FROM ({soft404_flags_sql("SELECT host, doc_id, text FROM hhp")})
),
hhtr AS (
  SELECT url, is_trap
  FROM ({trap_url_scores_sql("SELECT url FROM hhp")})
),
hhcc AS (
  SELECT url, is_winner, group_size
  FROM ({canonical_collapse_sql("SELECT url, html FROM hhp")})
),
per AS (
  SELECT p.host,
         t.boilerplate_heavy, s.is_soft404, r.is_trap,
         (c.group_size > 1 AND NOT c.is_winner) AS dup_loser
  FROM hhp p
  JOIN hht t ON t.host = p.host AND t.doc_id = p.doc_id
  JOIN hhs s ON s.host = p.host AND s.doc_id = p.doc_id
  JOIN hhtr r ON r.url = p.url
  JOIN hhcc c ON c.url = p.url
),
agg AS (
  SELECT host,
         count(*)::BIGINT AS n_pages,
         sum(CASE WHEN boilerplate_heavy THEN 1 ELSE 0 END)::BIGINT
           AS n_boiler,
         sum(CASE WHEN is_soft404 THEN 1 ELSE 0 END)::BIGINT AS n_soft404,
         sum(CASE WHEN is_trap THEN 1 ELSE 0 END)::BIGINT AS n_trap,
         sum(CASE WHEN dup_loser THEN 1 ELSE 0 END)::BIGINT AS n_dup_losers
  FROM per GROUP BY host
)
SELECT *,
       (2 * n_trap + n_soft404 + n_boiler + n_dup_losers)::BIGINT AS penalty,
       (2 * n_trap + n_soft404 + n_boiler + n_dup_losers) * 5 <= n_pages
         AS healthy
FROM agg
"""
