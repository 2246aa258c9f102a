"""Edit-distance pair audit (E122).

The verification channels score SET overlap (Jaccard, containment,
hamming); an audit of elected duplicate pairs wants the SEQUENCE
story — how many character edits actually separate the two texts
(near-identical re-renders audit at distance ~0; high-Jaccard
reordered spam does not).  Both engines ship the same classic
Levenshtein as a built-in (`F.levenshtein` / DuckDB `levenshtein`),
so the kernel stays JVM-side with a hard cross-engine twin.

Cost control is part of the semantics: Levenshtein is O(n*m), so the
operator audits a PREFIX window (``cap`` chars, default 256) — the
published audit practice for long documents — and reports the window
lengths it actually compared.  Similarity is an exact integer
division rounded at 6, the engine-wide float discipline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EDIT_CAP = 256


def edit_pair_stats(
    pairs: DataFrame,
    cap: int = EDIT_CAP,
    a_col: str = "text_a",
    b_col: str = "text_b",
) -> DataFrame:
    """pairs(pair_id, text_a, text_b) -> (pair_id, len_a, len_b,
    edit_dist, sim6); sim6 = 1 - dist/max(len) over the capped
    window, 0.0 when both sides are empty."""
    a = F.substring(F.col(a_col), 1, cap)
    b = F.substring(F.col(b_col), 1, cap)
    la = F.length(a)
    lb = F.length(b)
    dist = F.levenshtein(a, b)
    hi = F.greatest(la, lb)
    sim = F.when(
        hi > 0,
        F.round(F.lit(1.0) - dist.cast("double") / hi.cast("double"), 6),
    ).otherwise(F.lit(0.0))
    return pairs.select(
        "pair_id",
        la.cast("long").alias("len_a"),
        lb.cast("long").alias("len_b"),
        dist.cast("long").alias("edit_dist"),
        sim.alias("sim6"),
    )


def edit_pair_stats_sql(pairs_sql: str, cap: int = EDIT_CAP) -> str:
    """DuckDB twin; ``pairs_sql`` SELECTs (pair_id, text_a, text_b)."""
    return f"""
WITH eps AS ({pairs_sql}),
win AS (
  SELECT pair_id,
         substr(text_a, 1, {cap}) AS a,
         substr(text_b, 1, {cap}) AS b
  FROM eps
)
SELECT pair_id,
       len(a)::BIGINT AS len_a,
       len(b)::BIGINT AS len_b,
       levenshtein(a, b)::BIGINT AS edit_dist,
       CASE WHEN greatest(len(a), len(b)) > 0
            THEN round(1.0 - levenshtein(a, b)
                       / greatest(len(a), len(b)), 6)
            ELSE 0.0 END AS sim6
FROM win
"""
