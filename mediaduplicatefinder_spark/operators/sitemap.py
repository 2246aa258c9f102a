"""Sitemap extraction (E97).

The third crawl-control input next to robots.txt (E95) and the link
graph (E77): sitemaps enumerate the urls a host WANTS crawled, with
optional recency hints.  At crawl scale this is again a relational
pass, not a parser loop: explode ``<url>`` blocks from each host's
sitemap payload, extract ``<loc>`` / ``<lastmod>`` / ``<changefreq>``,
and emit seed rows a frontier union consumes (an E96-style scheduler
joins these against robots permission and quota).

Deterministic subset: literal tag extraction via regexp (no entity
decoding, first tag occurrence per block wins — the shape real
sitemaps overwhelmingly have); ``lastmod`` is kept as the raw
``YYYY-MM-DD`` prefix string (date semantics belong to the scheduler;
string form keeps the twin exact).  Malformed blocks without a
``<loc>`` are dropped.  Map-only, whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BLOCK_RE = "<url>(.*?)</url>"
_LOC_RE = "<loc>([^<]*)</loc>"
_LASTMOD_RE = "<lastmod>([^<]*)</lastmod>"
_FREQ_RE = "<changefreq>([^<]*)</changefreq>"


def extract_sitemap_urls(sitemaps: DataFrame) -> DataFrame:
    """sitemaps(host, payload) -> (host, loc, lastmod, changefreq);
    lastmod/changefreq NULL when absent, blocks without <loc> dropped."""
    block = F.explode(
        F.regexp_extract_all(F.col("payload"), F.lit(_BLOCK_RE), F.lit(1))
    )
    b = sitemaps.select("host", block.alias("b"))
    loc = F.regexp_extract("b", _LOC_RE, 1)
    lastmod = F.regexp_extract("b", _LASTMOD_RE, 1)
    freq = F.regexp_extract("b", _FREQ_RE, 1)
    return (
        b.select(
            "host",
            loc.alias("loc"),
            F.when(lastmod != "", lastmod).alias("lastmod"),
            F.when(freq != "", freq).alias("changefreq"),
        )
        .filter(F.col("loc") != "")
    )


def extract_sitemap_urls_sql(sitemaps_sql: str) -> str:
    """DuckDB twin; ``sitemaps_sql`` SELECTs (host, payload)."""
    return f"""
WITH sm AS ({sitemaps_sql}),
blocks AS (
  SELECT host,
         unnest(regexp_extract_all(payload, '{_BLOCK_RE}', 1)) AS b
  FROM sm
),
fields AS (
  SELECT host,
         regexp_extract(b, '{_LOC_RE}', 1) AS loc,
         regexp_extract(b, '{_LASTMOD_RE}', 1) AS lastmod,
         regexp_extract(b, '{_FREQ_RE}', 1) AS changefreq
  FROM blocks
)
SELECT host, loc,
       CASE WHEN lastmod <> '' THEN lastmod END AS lastmod,
       CASE WHEN changefreq <> '' THEN changefreq END AS changefreq
FROM fields WHERE loc <> ''
"""
