"""Duplicate-family size histogram (E125).

The corpus-card view of duplication: how many families of size 2, 3,
... N exist, how many documents and bytes each size class wastes, and
what fraction of the corpus survives dedup.  This is the rollup every
published dedup paper reports (C4/RefinedWeb/Gopher duplication
tables) and the first sanity check after any channel change — a
histogram whose tail suddenly grows means a channel started
over-merging.

Shape: two aggregations — families from the sha exchange (the E1
key), then ONE tiny exchange on family size.  Singletons are counted
in the totals but excluded from the per-size rows (size >= 2), the
convention of the reference's stats rollup (A6, duplicate_gui.py:444).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def dup_family_histogram(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """docs(doc_id, text) -> one row per family size >= 2:
    (family_size, n_families, n_docs, wasted_docs, wasted_bytes);
    wasted = everything beyond one kept copy per family."""
    fams = (
        docs.select(
            F.sha2(F.col(text_col), 256).alias("sha"),
            F.octet_length(text_col).alias("nb"),
        )
        .groupBy("sha")
        .agg(
            F.count(F.lit(1)).alias("family_size"),
            F.min("nb").alias("nb"),
        )
    )
    return (
        fams.filter(F.col("family_size") >= 2)
        .groupBy("family_size")
        .agg(
            F.count(F.lit(1)).alias("n_families"),
            F.sum("family_size").cast("long").alias("n_docs"),
            F.sum(F.col("family_size") - 1).cast("long").alias(
                "wasted_docs"
            ),
            F.sum((F.col("family_size") - 1) * F.col("nb"))
            .cast("long")
            .alias("wasted_bytes"),
        )
        .select(
            F.col("family_size").cast("long").alias("family_size"),
            "n_families",
            "n_docs",
            "wasted_docs",
            "wasted_bytes",
        )
    )


def dup_family_histogram_sql(docs_sql: str) -> str:
    """DuckDB twin; ``docs_sql`` SELECTs (doc_id, text)."""
    return f"""
WITH dfh AS ({docs_sql}),
fams AS (
  SELECT sha256(text) AS sha,
         count(*)::BIGINT AS family_size,
         min(octet_length(encode(text)))::BIGINT AS nb
  FROM dfh GROUP BY sha
)
SELECT family_size,
       count(*)::BIGINT AS n_families,
       sum(family_size)::BIGINT AS n_docs,
       sum(family_size - 1)::BIGINT AS wasted_docs,
       sum((family_size - 1) * nb)::BIGINT AS wasted_bytes
FROM fams
WHERE family_size >= 2
GROUP BY family_size
"""
