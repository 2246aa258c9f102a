"""Shingle containment pairs (E80, Broder SEQUENCES 1997).

Resemblance (Jaccard) misses the asymmetric case a web corpus is full
of: a short document wholly quoted inside a long one (syndicated
article + surrounding boilerplate, quoted posts, scraped excerpts).
Containment ``C(A,B) = |S(A) ∩ S(B)| / |S(A)|`` is ~1 for the quoted
side while Jaccard stays near ``|A|/|B|`` — so a containment channel
catches subset duplication the E2/E4 resemblance channels score low.
(The E35/E36 suffix channels find *contiguous* substring overlap; set
containment also fires on interleaved/reordered reuse.)

Scale shape — the inverted-index pair join, NOT all-pairs:
postings (shingle_hash, doc_id) self-join on the hash, so only
documents that actually share a shingle ever meet, and the intersection
size falls out of a count per pair.  One shuffle on the 8-byte shingle
hash + one on the pair key.  Hot boilerplate shingles are the skew
channel: any shingle appearing in more than ``df_cap`` docs is dropped
as a stop-shingle BEFORE pairing (deterministic rule, mirrored in the
twin; containment is then defined within the filtered shingle space —
per-doc sizes count kept shingles only, keeping C <= 1 exact).

Determinism: shingles travel as ``xxhash64`` of the '_'-joined k-gram;
the oracle intersects the shingle STRINGS — agreement doubles as the
collision check (the engine-wide xxh64-channel precedent).  The two
containment ratios are one exact-integer division each, rounded at 6;
the emit threshold compares the RAW doubles identically in both
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CONT_K = 5
CONT_DF_CAP = 64
CONT_THRESHOLD = 0.5


def shingle_containment_pairs(
    docs: DataFrame,
    k: int = CONT_K,
    df_cap: int = CONT_DF_CAP,
    threshold: float = CONT_THRESHOLD,
    text_col: str = "text",
) -> DataFrame:
    """docs(doc_id, text) ->
    (doc_a, doc_b, inter, n_a, n_b, cont_a, cont_b) for pairs where
    max(containment either way) >= threshold."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - (k - 1)),
            lambda i: F.xxhash64(F.concat_ws("_", F.slice(toks, i, k))),
        )
    )
    sh = (
        docs.filter(F.size(toks) >= k)
        .select("doc_id", F.explode(shingles).alias("s"))
    )
    df = sh.groupBy("s").agg(F.count(F.lit(1)).alias("c"))
    # keep feeds the posting self-join (both sides) AND the per-doc
    # sizes: without a persist Catalyst re-derives the shingle explode
    # + df-filter SIX times (observed in the physical plan) — at scale
    # that is six scans of the corpus text
    keep = (
        sh.join(df.filter(F.col("c") <= df_cap), "s")
        .select("doc_id", "s")
        .persist()
    )
    ns = keep.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = keep.select(F.col("doc_id").alias("doc_a"), "s")
    b = keep.select(F.col("doc_id").alias("doc_b"), "s")
    pairs = (
        a.join(b, "s")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    na = ns.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a"))
    nb = ns.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b"))
    ca = F.col("inter") / F.col("n_a")
    cb = F.col("inter") / F.col("n_b")
    return (
        pairs.join(na, "doc_a")
        .join(nb, "doc_b")
        .filter(F.greatest(ca, cb) >= F.lit(threshold))
        .select(
            "doc_a",
            "doc_b",
            "inter",
            "n_a",
            "n_b",
            F.round(ca, 6).alias("cont_a"),
            F.round(cb, 6).alias("cont_b"),
        )
    )


def shingle_containment_pairs_sql(
    docs_sql: str = "SELECT doc_id, text FROM documents",
    k: int = CONT_K,
    df_cap: int = CONT_DF_CAP,
    threshold: float = CONT_THRESHOLD,
) -> str:
    """DuckDB twin over shingle STRINGS (collision check rides)."""
    return f"""
WITH cdocs AS ({docs_sql}),
sh AS (
  SELECT doc_id, unnest(list_distinct(list_transform(
           generate_series(1, len(ws) - {k - 1}),
           i -> array_to_string(list_slice(ws, i, i + {k - 1}), '_'))))
           AS s
  FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
        FROM cdocs)
  WHERE len(ws) >= {k}
),
sdf AS (SELECT s, count(*)::BIGINT AS c FROM sh GROUP BY s),
keep AS (
  SELECT sh.doc_id, sh.s FROM sh JOIN sdf USING (s) WHERE sdf.c <= {df_cap}
),
ns AS (SELECT doc_id, count(*)::BIGINT AS n FROM keep GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS inter
  FROM keep a JOIN keep b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b, inter, na.n AS n_a, nb.n AS n_b,
       round(inter / na.n, 6) AS cont_a,
       round(inter / nb.n, 6) AS cont_b
FROM pairs
JOIN ns na ON na.doc_id = doc_a
JOIN ns nb ON nb.doc_id = doc_b
WHERE greatest(inter / na.n, inter / nb.n) >= {threshold!r}
"""
