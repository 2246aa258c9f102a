"""Soft-404 detection (E101).

Web servers routinely answer missing pages with HTTP 200 and an
"error page" body — so a crawl accumulates thousands of near-identical
"not found" pages per host that pollute both the corpus and the dedup
statistics (they form giant fake duplicate families).  The standard
detector (Bar-Yossef et al., WWW 2004 "Sic transit gloria telae")
combines CONTENT evidence (error phrasing) with a SIZE prior (error
pages are far smaller than the host's typical page).

Deterministic integer subset: ``phrase_hits`` counts literal error
phrases contained in the lowercased text, the size prior is the host
LOWER median of text length (the E89 rank-median primitive — integer,
no interpolation), and the flag is pure boolean algebra::

    is_soft404 = phrase_hits >= 2
                 OR (phrase_hits >= 1 AND 2 * n_chars < host_med)

Shape: the phrase scan is map-only codegen; the median costs one
ranking window per host (one exchange of (host, int64) rows) whose
result joins back on the host key.  At 10^12 rows the exact rank
median swaps for a histogram median — the E89 note applies verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SOFT404_PHRASES = (
    "page not found",
    "not be found",
    "no longer available",
    "does not exist",
    "been removed",
    "error 404",
)


def soft404_flags(
    pages: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
) -> DataFrame:
    """pages(host, doc_id, text) -> (host, doc_id, n_chars,
    phrase_hits, host_med, is_soft404)."""
    low = F.lower(F.col(text_col))
    hits = sum(
        (
            F.when(low.contains(p), F.lit(1)).otherwise(F.lit(0))
            for p in SOFT404_PHRASES
        ),
        F.lit(0),
    )
    base = pages.select(
        host_col,
        "doc_id",
        F.length(text_col).cast("long").alias("n_chars"),
        hits.cast("long").alias("phrase_hits"),
    )
    w = Window.partitionBy(host_col).orderBy(
        F.col("n_chars").asc(), F.col("doc_id").asc()
    )
    cnt = Window.partitionBy(host_col)
    ranked = base.select(
        "*",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(cnt).alias("n"),
    )
    med = ranked.filter(F.col("rn") == F.expr("(n + 1) div 2")).select(
        host_col, F.col("n_chars").alias("host_med")
    )
    flag = (F.col("phrase_hits") >= 2) | (
        (F.col("phrase_hits") >= 1)
        & (F.lit(2) * F.col("n_chars") < F.col("host_med"))
    )
    return base.join(med, host_col).select(
        host_col,
        "doc_id",
        "n_chars",
        "phrase_hits",
        "host_med",
        flag.alias("is_soft404"),
    )


def soft404_flags_sql(pages_sql: str) -> str:
    """DuckDB twin; ``pages_sql`` SELECTs (host, doc_id, text)."""
    hit_sum = " + ".join(
        f"CASE WHEN position('{p}' IN lower(text)) > 0 THEN 1 ELSE 0 END"
        for p in SOFT404_PHRASES
    )
    return f"""
WITH spages AS ({pages_sql}),
base AS (
  SELECT host, doc_id,
         len(text)::BIGINT AS n_chars,
         ({hit_sum})::BIGINT AS phrase_hits
  FROM spages
),
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY host
                            ORDER BY n_chars ASC, doc_id ASC) AS rn,
         count(*) OVER (PARTITION BY host) AS n
  FROM base
),
med AS (
  SELECT host, n_chars AS host_med FROM ranked WHERE rn = (n + 1) // 2
)
SELECT b.host, b.doc_id, b.n_chars, b.phrase_hits, m.host_med,
       (b.phrase_hits >= 2
        OR (b.phrase_hits >= 1 AND 2 * b.n_chars < m.host_med))
         AS is_soft404
FROM base b JOIN med m USING (host)
"""
