"""Title/metadata extraction + title-duplicate families (E107).

The cheapest duplicate-candidate channel a crawl pipeline has: two
pages on one host with the same normalized ``<title>`` are duplicate
candidates before any content hashing runs (CDX pipelines use exactly
this as a prefilter; it is the url-stem name shortcut of the reference
— main_cli.cpp:246-257 — lifted to page metadata).  Normalization is
deterministic: lowercase + whitespace collapse, so case and
indentation variants of one title collide.

Shape: map-only extraction, then ONE exchange on the (host,
norm_title) family key for size + winner election (min url — the
engine's deterministic-order convention).  Pages without a title
never enter the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TITLE_RE = "<title>([^<]*)</title>"
_DESC_RE = '<meta name="description" content="([^"]*)"'


def title_dup_families(
    pages: DataFrame, host_col: str = "host"
) -> DataFrame:
    """pages(host, url, html) -> (url, host, norm_title, desc_len,
    family_size, is_winner); pages without a <title> are dropped."""
    title = F.regexp_extract("html", _TITLE_RE, 1)
    norm = F.trim(F.regexp_replace(F.lower(title), "\\s+", " "))
    desc = F.regexp_extract("html", _DESC_RE, 1)
    base = pages.select(
        "url",
        host_col,
        norm.alias("norm_title"),
        F.length(desc).cast("long").alias("desc_len"),
    ).filter(F.col("norm_title") != "")
    fam = Window.partitionBy(host_col, "norm_title")
    return base.select(
        "url",
        host_col,
        "norm_title",
        "desc_len",
        F.count(F.lit(1)).over(fam).cast("long").alias("family_size"),
        (F.col("url") == F.min("url").over(fam)).alias("is_winner"),
    )


def title_dup_families_sql(pages_sql: str) -> str:
    """DuckDB twin; ``pages_sql`` SELECTs (host, url, html)."""
    return f"""
WITH tdp AS ({pages_sql}),
base AS (
  SELECT url, host,
         trim(regexp_replace(lower(
           regexp_extract(html, '{_TITLE_RE}', 1)), '\\s+', ' ', 'g'))
           AS norm_title,
         len(regexp_extract(html, '{_DESC_RE}', 1))::BIGINT AS desc_len
  FROM tdp
)
SELECT url, host, norm_title, desc_len,
       count(*) OVER (PARTITION BY host, norm_title)::BIGINT
         AS family_size,
       url = min(url) OVER (PARTITION BY host, norm_title) AS is_winner
FROM base
WHERE norm_title <> ''
"""
