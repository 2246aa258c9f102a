"""Cross-source priority dedup (E120).

Training corpora are unions of sources with different trust levels
(curated wiki dumps, books, bulk web), and the same document shows up
in several of them.  Published practice (The Pile §2.5, Dolma's dedup
order) is POLICY dedup: within a duplicate family, keep the copy from
the highest-priority source — not the lexicographic winner the
within-corpus channels elect — so dedup and curation compose instead
of fighting.

Shape: exactly the E1 exact-dup plan with a policy election — one
exchange on the sha key computing ``min(struct(priority, doc_id))``
(total deterministic order: best source first, stable doc tiebreak)
plus family size and distinct-source count, joined back to tag every
row.  The ``n_sources`` column is the curation signal: families
spanning many sources are canonical public texts, not crawl
accidents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SOURCE_PRIORITY = (("wiki", 1), ("books", 2), ("web", 3))
_UNKNOWN_PRIORITY = 9


def _priority_expr():
    e = None
    for name, p in SOURCE_PRIORITY:
        c = F.when(F.col("source") == name, F.lit(p))
        e = c if e is None else e.when(F.col("source") == name, F.lit(p))
    return e.otherwise(F.lit(_UNKNOWN_PRIORITY))


def source_priority_dedup(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """docs(source, doc_id, text) -> (source, doc_id, family_size,
    n_sources, priority, is_kept)."""
    keyed = docs.select(
        "source",
        "doc_id",
        F.sha2(F.col(text_col), 256).alias("sha"),
        _priority_expr().cast("long").alias("priority"),
    )
    fam = keyed.groupBy("sha").agg(
        F.min(F.struct("priority", "doc_id")).alias("win"),
        F.count(F.lit(1)).alias("family_size"),
        F.countDistinct("source").alias("n_sources"),
    )
    return keyed.join(fam, "sha").select(
        "source",
        "doc_id",
        F.col("family_size").cast("long").alias("family_size"),
        F.col("n_sources").cast("long").alias("n_sources"),
        "priority",
        (
            (F.col("priority") == F.col("win.priority"))
            & (F.col("doc_id") == F.col("win.doc_id"))
        ).alias("is_kept"),
    )


def source_priority_dedup_sql(docs_sql: str) -> str:
    """DuckDB twin; ``docs_sql`` SELECTs (source, doc_id, text)."""
    prio = " ".join(
        f"WHEN '{name}' THEN {p}" for name, p in SOURCE_PRIORITY
    )
    return f"""
WITH spd AS ({docs_sql}),
keyed AS (
  SELECT source, doc_id, sha256(text) AS sha,
         (CASE source {prio} ELSE {_UNKNOWN_PRIORITY} END)::BIGINT
           AS priority
  FROM spd
),
ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY sha
                            ORDER BY priority ASC, doc_id ASC) AS rn,
         count(*) OVER (PARTITION BY sha)::BIGINT AS family_size
  FROM keyed
),
nsrc AS (
  SELECT sha, count(DISTINCT source)::BIGINT AS n_sources
  FROM keyed GROUP BY sha
)
SELECT r.source, r.doc_id, r.family_size, n.n_sources, r.priority,
       r.rn = 1 AS is_kept
FROM ranked r JOIN nsrc n USING (sha)
"""
