"""Normalized-exact dedup (E114, "fuzzy-exact").

Between the byte-exact sha channel (E1) and the probabilistic MinHash
channel (E2) sits the published middle ground (RefinedWeb §3.3 runs
exact dedup AFTER normalization): two documents whose texts differ
only in case, punctuation, or whitespace are the same document — a
re-render, not a revision — and should collapse without spending an
LSH candidate on them.  The canonical key is the engine's shared
normalization (functions/text.normalized_text_expr: lowercase, strip
non-alnum keeping whitespace) plus whitespace collapse; families form
on the sha of that key.

Shape: exactly the E1 plan with a different key — fused map-side
normalization + hash, ONE exchange on the 32-byte key, min-doc_id
winner election (the deterministic-order convention).  The
``was_normalized`` evidence column marks docs whose key differs from
their raw text — the rows this channel catches and E1 misses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mediaduplicatefinder_spark.functions.text import (
    normalized_text_expr,
)


def normalized_exact_families(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """docs(doc_id, text) -> (doc_id, family_size, is_winner,
    was_normalized)."""
    norm = F.trim(
        F.regexp_replace(normalized_text_expr(F.col(text_col)), "\\s+", " ")
    )
    keyed = docs.select(
        "doc_id",
        F.sha2(norm, 256).alias("fam_key"),
        (norm != F.col(text_col)).alias("was_normalized"),
    )
    fam = Window.partitionBy("fam_key")
    return keyed.select(
        "doc_id",
        F.count(F.lit(1)).over(fam).cast("long").alias("family_size"),
        (F.col("doc_id") == F.min("doc_id").over(fam)).alias("is_winner"),
        "was_normalized",
    )


def normalized_exact_families_sql(docs_sql: str) -> str:
    """DuckDB twin; ``docs_sql`` SELECTs (doc_id, text)."""
    norm = (
        "trim(regexp_replace(lower(regexp_replace(text,"
        " '[^a-zA-Z0-9 \\t\\n\\r\\f\\v]', '', 'g')), '\\s+', ' ', 'g'))"
    )
    return f"""
WITH nef AS ({docs_sql}),
keyed AS (
  SELECT doc_id, sha256({norm}) AS fam_key,
         {norm} <> text AS was_normalized
  FROM nef
)
SELECT doc_id,
       count(*) OVER (PARTITION BY fam_key)::BIGINT AS family_size,
       doc_id = min(doc_id) OVER (PARTITION BY fam_key) AS is_winner,
       was_normalized
FROM keyed
"""
