"""Duplicate-span interval union / coverage (E88).

The substring channels (E35 suffix spans, E36 ExactSubstr, E28 C4
spans) emit per-document lists of duplicated [start, end) intervals
that OVERLAP — the same region is reported by many pair matches.  The
policy number every pipeline actually acts on ("drop docs > 50%
duplicated", "how many bytes would span-removal delete") needs the
UNION of those intervals per document: the classic gaps-and-islands
merge, here as one window pass.

Algorithm (identical in both engines, pure integer):
- order a doc's spans by (s, e); running max of previous ends via a
  cumulative-max window (ROWS UNBOUNDED PRECEDING .. 1 PRECEDING);
- a span starts a NEW island iff s > that running max (strictly:
  touching intervals [1,5) + [5,9) merge — adjacency counts, the
  span-removal semantics);
- island id = cumulative sum of new-island flags; per island take
  min(s), max(e); per doc sum the island lengths.

One shuffle keyed on doc_id (the window), then two aggregations.
Output: per-doc n_spans, n_islands, covered (union length), and
coverage vs the document length — exact division, rounded at 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def span_coverage(
    spans: DataFrame, docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """spans(doc_id, s, e) x docs(doc_id, text) ->
    (doc_id, n_chars, n_spans, n_islands, covered, coverage).

    Intervals are half-open [s, e), 0-based; docs with no spans report
    zero coverage."""
    w_ord = Window.partitionBy("doc_id").orderBy(
        F.col("s").asc(), F.col("e").asc()
    )
    prev_max = F.max("e").over(
        w_ord.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = spans.select(
        "doc_id",
        "s",
        "e",
        F.when(
            prev_max.isNull() | (F.col("s") > prev_max), F.lit(1)
        )
        .otherwise(F.lit(0))
        .alias("new_island"),
    )
    islanded = flagged.withColumn(
        "island",
        F.sum("new_island").over(
            w_ord.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    islands = islanded.groupBy("doc_id", "island").agg(
        F.min("s").alias("is_"), F.max("e").alias("ie")
    )
    per_doc = islands.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.sum(F.col("ie") - F.col("is_")).alias("covered"),
    )
    n_spans = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans")
    )
    base = docs.select(
        "doc_id", F.length(text_col).cast("long").alias("n_chars")
    )
    return (
        base.join(n_spans, "doc_id", "left")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_chars",
            F.coalesce("n_spans", F.lit(0)).alias("n_spans"),
            F.coalesce("n_islands", F.lit(0)).alias("n_islands"),
            F.coalesce("covered", F.lit(0)).alias("covered"),
            F.when(
                F.col("n_chars") > 0,
                F.round(
                    F.coalesce("covered", F.lit(0)) / F.col("n_chars"), 6
                ),
            )
            .otherwise(F.lit(0.0))
            .alias("coverage"),
        )
    )


def span_coverage_sql(spans_sql: str, docs_sql: str) -> str:
    """DuckDB twin. ``spans_sql`` SELECTs (doc_id, s, e); ``docs_sql``
    SELECTs (doc_id, text)."""
    return f"""
WITH sc_spans AS ({spans_sql}),
sc_docs AS ({docs_sql}),
flagged AS (
  SELECT doc_id, s, e,
         CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END AS new_island
  FROM (
    SELECT doc_id, s, e,
           max(e) OVER (PARTITION BY doc_id ORDER BY s ASC, e ASC
                        ROWS BETWEEN UNBOUNDED PRECEDING
                        AND 1 PRECEDING) AS pm
    FROM sc_spans
  )
),
islanded AS (
  SELECT doc_id, s, e,
         sum(new_island) OVER (PARTITION BY doc_id
                               ORDER BY s ASC, e ASC
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND CURRENT ROW) AS island
  FROM flagged
),
islands AS (
  SELECT doc_id, island, min(s) AS is_, max(e) AS ie
  FROM islanded GROUP BY doc_id, island
),
per_doc AS (
  SELECT doc_id, count(*)::BIGINT AS n_islands,
         sum(ie - is_)::BIGINT AS covered
  FROM islands GROUP BY doc_id
),
nsp AS (
  SELECT doc_id, count(*)::BIGINT AS n_spans FROM sc_spans GROUP BY doc_id
)
SELECT d.doc_id, length(d.text)::BIGINT AS n_chars,
       coalesce(n.n_spans, 0) AS n_spans,
       coalesce(p.n_islands, 0) AS n_islands,
       coalesce(p.covered, 0) AS covered,
       CASE WHEN length(d.text) > 0
            THEN round(coalesce(p.covered, 0) / length(d.text), 6)
            ELSE 0.0 END AS coverage
FROM sc_docs d
LEFT JOIN nsp n USING (doc_id)
LEFT JOIN per_doc p USING (doc_id)
"""
