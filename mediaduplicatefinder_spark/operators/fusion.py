"""Multi-channel duplicate-evidence fusion (E90).

No single candidate channel covers webtext duplication: resemblance
(n-gram Jaccard) misses subsets, containment misses heavy rewrites
with shared vocabulary, sorted-neighborhood only sees shared openings.
Production dedup therefore FUSES channels and lets the downstream
policy weigh agreement — a pair flagged by two independent channels is
categorically stronger evidence than either alone (the ensemble
argument of the E31/E39 soft-dedup family, applied at the pair level).

This operator full-outer-joins three pair relations on the normalized
(doc_a < doc_b) key and emits per-channel membership flags, each
channel's native score, and ``n_channels`` — the integer agreement
count a keeper/removal policy thresholds on.

Shape: each channel is its own bounded pipeline (posting join /
sort+window / LSH-style blocking); the fusion itself is two outer
joins on an 16-byte pair key — negligible next to the channels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuse_pair_channels(
    ngram: DataFrame, cont: DataFrame, snm: DataFrame
) -> DataFrame:
    """ngram(doc_a, doc_b, ngram_jaccard) x
    cont(doc_a, doc_b, cont_a, cont_b) x
    snm(doc_a, doc_b, common_prefix) ->
    (doc_a, doc_b, in_ngram, in_cont, in_snm, n_channels,
     ngram_jaccard, cont_max, snm_prefix).

    Pair keys are normalized to doc_a < doc_b (SNM orders by sort key,
    not id; its evidence is symmetric)."""

    def norm(df: DataFrame, cols: list[str]) -> DataFrame:
        a = F.least("doc_a", "doc_b").alias("doc_a")
        b = F.greatest("doc_a", "doc_b").alias("doc_b")
        return df.select(a, b, *cols).groupBy("doc_a", "doc_b").agg(
            *[F.max(c).alias(c) for c in cols]
        )

    ng = norm(ngram, ["ngram_jaccard"])
    ct = norm(
        cont.withColumn(
            "cont_max", F.greatest("cont_a", "cont_b")
        ),
        ["cont_max"],
    )
    sn = norm(
        snm.withColumnRenamed("common_prefix", "snm_prefix"),
        ["snm_prefix"],
    )
    j = ng.join(ct, ["doc_a", "doc_b"], "full_outer").join(
        sn, ["doc_a", "doc_b"], "full_outer"
    )
    in_ng = F.col("ngram_jaccard").isNotNull()
    in_ct = F.col("cont_max").isNotNull()
    in_sn = F.col("snm_prefix").isNotNull()
    return j.select(
        "doc_a",
        "doc_b",
        in_ng.alias("in_ngram"),
        in_ct.alias("in_cont"),
        in_sn.alias("in_snm"),
        (
            in_ng.cast("long") + in_ct.cast("long") + in_sn.cast("long")
        ).alias("n_channels"),
        "ngram_jaccard",
        "cont_max",
        "snm_prefix",
    )


def fuse_pair_channels_sql(
    ngram_sql: str, cont_sql: str, snm_sql: str
) -> str:
    """DuckDB twin: each channel's full twin query runs as a subquery
    (nested WITH is legal), normalized and fused identically."""
    return f"""
WITH ng AS (
  SELECT least(doc_a, doc_b) AS doc_a, greatest(doc_a, doc_b) AS doc_b,
         max(ngram_jaccard) AS ngram_jaccard
  FROM ({ngram_sql}) GROUP BY 1, 2
),
ct AS (
  SELECT least(doc_a, doc_b) AS doc_a, greatest(doc_a, doc_b) AS doc_b,
         max(greatest(cont_a, cont_b)) AS cont_max
  FROM ({cont_sql}) GROUP BY 1, 2
),
sn AS (
  SELECT least(doc_a, doc_b) AS doc_a, greatest(doc_a, doc_b) AS doc_b,
         max(common_prefix) AS snm_prefix
  FROM ({snm_sql}) GROUP BY 1, 2
),
j AS (
  SELECT coalesce(ng.doc_a, ct.doc_a, sn.doc_a) AS doc_a,
         coalesce(ng.doc_b, ct.doc_b, sn.doc_b) AS doc_b,
         ng.ngram_jaccard, ct.cont_max, sn.snm_prefix
  FROM ng
  FULL OUTER JOIN ct ON ng.doc_a = ct.doc_a AND ng.doc_b = ct.doc_b
  FULL OUTER JOIN sn
    ON coalesce(ng.doc_a, ct.doc_a) = sn.doc_a
   AND coalesce(ng.doc_b, ct.doc_b) = sn.doc_b
)
SELECT doc_a, doc_b,
       ngram_jaccard IS NOT NULL AS in_ngram,
       cont_max IS NOT NULL AS in_cont,
       snm_prefix IS NOT NULL AS in_snm,
       ((ngram_jaccard IS NOT NULL)::BIGINT
        + (cont_max IS NOT NULL)::BIGINT
        + (snm_prefix IS NOT NULL)::BIGINT) AS n_channels,
       ngram_jaccard, cont_max, snm_prefix
FROM j
"""
