"""Anchor-text aggregation per target host (E85).

What the web calls a page is partly defined by how OTHER pages link to
it — search engines have indexed anchor text since Brin & Page 1998,
and crawl pipelines use per-host anchor profiles as quality priors
(a host linked mostly as "cheap pills casino" is scored accordingly)
and as label material.  This operator inverts the link graph with its
text: extract (target_host, anchor_text) from every anchor tag,
tokenize, and keep each host's top-k terms by frequency
(count DESC, term ASC — a total deterministic order).

Shape: extraction is map-only column work (regexp over html, JVM
codegen); the term count is one shuffle on (host, term); the top-k is
a window over per-(host, term) AGGREGATES — cardinality bounded by
vocabulary, not by pages, so the mega-host skew of raw anchors never
reaches the sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ANCHOR_RE = r'<a href="http://([^/"]+)[^>]*>([^<]*)</a>'
ANCHOR_TOP_K = 5


def host_anchor_terms(
    pages: DataFrame, html_col: str = "html", top_k: int = ANCHOR_TOP_K
) -> DataFrame:
    """pages(html) -> (host, term, cnt, rnk) — each target host's top-k
    anchor-text terms."""
    anchors = F.explode(
        F.regexp_extract_all(F.col(html_col), F.lit(ANCHOR_RE), F.lit(0))
    )
    a = pages.select(anchors.alias("a")).select(
        F.regexp_extract("a", ANCHOR_RE, 1).alias("host"),
        F.regexp_extract("a", ANCHOR_RE, 2).alias("atext"),
    )
    terms = a.select(
        "host",
        F.explode(
            F.filter(
                F.split(F.lower("atext"), "[^a-z0-9]+"), lambda w: w != ""
            )
        ).alias("term"),
    )
    counts = terms.groupBy("host", "term").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("host").orderBy(
        F.col("cnt").desc(), F.col("term").asc()
    )
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= top_k)
        .select("host", "term", "cnt", F.col("rnk").cast("long").alias("rnk"))
    )


def host_anchor_terms_sql(
    pages_sql: str, top_k: int = ANCHOR_TOP_K
) -> str:
    return f"""
WITH at_pages AS ({pages_sql}),
raw AS (
  SELECT unnest(regexp_extract_all(html, '{ANCHOR_RE}', 0)) AS a
  FROM at_pages
),
pairs AS (
  SELECT regexp_extract(a, '{ANCHOR_RE}', 1) AS host,
         regexp_extract(a, '{ANCHOR_RE}', 2) AS atext
  FROM raw
),
terms AS (
  SELECT host,
         unnest(list_filter(
           string_split_regex(lower(atext), '[^a-z0-9]+'),
           p -> p <> '')) AS term
  FROM pairs
),
counts AS (
  SELECT host, term, count(*)::BIGINT AS cnt
  FROM terms GROUP BY host, term
)
SELECT host, term, cnt, rnk FROM (
  SELECT host, term, cnt,
         row_number() OVER (PARTITION BY host
                            ORDER BY cnt DESC, term ASC)::BIGINT AS rnk
  FROM counts
) WHERE rnk <= {top_k}
"""
