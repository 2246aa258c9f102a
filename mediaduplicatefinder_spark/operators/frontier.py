"""Frontier seed discovery (E104).

The discovery side of crawling, composed from the session's channel
operators: a url enters the frontier because a sitemap lists it (E97),
a crawled page links to it, or a crawled page declares it canonical
(E98's regexes — a canonical target you haven't crawled is the page
you SHOULD have).  Channels overlap, so the union dedups per url with
a fixed source priority (sitemap > link > canonical — the explicit
host intent outranks incidental discovery), already-crawled urls leave
via an anti-join, and every surviving seed carries the E100 trap score
so the scheduler can skip fetch-unworthy urls.

Shape: three map-only extractions union into one relation; ONE
aggregation on the url key does the cross-channel dedup (min
priority); the anti-join against crawled urls and the trap projection
are a hash join + map.  No pairing, no iteration — linear in
discovered urls.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mediaduplicatefinder_spark.functions.trapurl import (
    trap_url_scores,
    trap_url_scores_sql,
)
from mediaduplicatefinder_spark.operators.canonical import (
    _HREF_FIRST,
    _OG_URL,
    _REL_FIRST,
)
from mediaduplicatefinder_spark.operators.sitemap import (
    extract_sitemap_urls,
    extract_sitemap_urls_sql,
)

# anchor tags ONLY — a bare href pattern would also swallow
# <link rel="canonical" href=..> and misroute it to the link channel
# (pytest-pinned)
_ABS_HREF_RE = '<a [^>]*href="(http://[^"]*)"'

_SOURCES = ("sitemap", "link", "canonical")


def frontier_seeds(pages: DataFrame, sitemaps: DataFrame) -> DataFrame:
    """pages(url, html) + sitemaps(host, payload) ->
    (url, host, source, trap_score, is_trap) — discovered urls not yet
    crawled, one row each, source = highest-priority channel."""
    sm = extract_sitemap_urls(sitemaps).select(
        F.col("loc").alias("url"), F.lit(1).alias("prio")
    )
    links = pages.select(
        F.explode(
            F.regexp_extract_all(
                F.col("html"), F.lit(_ABS_HREF_RE), F.lit(1)
            )
        ).alias("url"),
        F.lit(2).alias("prio"),
    )
    c1 = F.regexp_extract("html", _REL_FIRST, 1)
    c2 = F.regexp_extract("html", _HREF_FIRST, 1)
    c3 = F.regexp_extract("html", _OG_URL, 1)
    decl = F.when(c1 != "", c1).when(c2 != "", c2).when(c3 != "", c3)
    canon = (
        pages.select(decl.alias("url"), F.lit(3).alias("prio"))
        .filter(F.col("url").isNotNull())
    )
    discovered = (
        sm.unionByName(links)
        .unionByName(canon)
        .groupBy("url")
        .agg(F.min("prio").alias("prio"))
        .join(pages.select("url"), "url", "left_anti")
        .persist()  # feeds the trap projection AND the priority join —
        # without it Catalyst re-derives the 3-channel union twice
    )
    src = (
        F.when(F.col("prio") == 1, F.lit(_SOURCES[0]))
        .when(F.col("prio") == 2, F.lit(_SOURCES[1]))
        .otherwise(F.lit(_SOURCES[2]))
    )
    scored = trap_url_scores(discovered)
    return (
        scored.join(discovered.select("url", "prio"), "url")
        .select(
            "url",
            "host",
            src.alias("source"),
            "trap_score",
            "is_trap",
        )
    )


def frontier_seeds_sql(pages_sql: str, sitemaps_sql: str) -> str:
    """DuckDB twin; ``pages_sql`` SELECTs (url, html), ``sitemaps_sql``
    SELECTs (host, payload)."""
    disc = f"""
WITH fpages AS ({pages_sql}),
sm AS (
  SELECT loc AS url, 1 AS prio
  FROM ({extract_sitemap_urls_sql(sitemaps_sql)})
),
lnk AS (
  SELECT unnest(regexp_extract_all(html, '{_ABS_HREF_RE}', 1)) AS url,
         2 AS prio
  FROM fpages
),
canon AS (
  SELECT CASE
           WHEN regexp_extract(html, '{_REL_FIRST}', 1) <> ''
             THEN regexp_extract(html, '{_REL_FIRST}', 1)
           WHEN regexp_extract(html, '{_HREF_FIRST}', 1) <> ''
             THEN regexp_extract(html, '{_HREF_FIRST}', 1)
           WHEN regexp_extract(html, '{_OG_URL}', 1) <> ''
             THEN regexp_extract(html, '{_OG_URL}', 1)
         END AS url,
         3 AS prio
  FROM fpages
),
uni AS (
  SELECT url, prio FROM sm
  UNION ALL SELECT url, prio FROM lnk
  UNION ALL SELECT url, prio FROM canon WHERE url IS NOT NULL
),
disc AS (
  SELECT url, min(prio) AS prio FROM uni GROUP BY url
),
fresh AS (
  SELECT d.url, d.prio FROM disc d
  WHERE NOT EXISTS (SELECT 1 FROM fpages p WHERE p.url = d.url)
)
SELECT url, prio FROM fresh
"""
    return f"""
WITH scored AS (
  SELECT * FROM ({trap_url_scores_sql(f"SELECT url FROM ({disc})")})
),
prios AS ({disc})
SELECT s.url, s.host,
       CASE p.prio WHEN 1 THEN '{_SOURCES[0]}'
                   WHEN 2 THEN '{_SOURCES[1]}'
                   ELSE '{_SOURCES[2]}' END AS source,
       s.trap_score, s.is_trap
FROM scored s JOIN prios p ON p.url = s.url
"""
