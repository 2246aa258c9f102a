"""DSIR data selection via importance resampling (E32, Xie et al.
2023, arXiv:2302.03169): score every corpus document by how much more
likely its hashed n-gram features are under a TARGET distribution than
under the raw-corpus BACKGROUND distribution, then sample with
deterministic Gumbel noise.

This is the "pick pretraining data that looks like the benchmark" step
of an LLM data pipeline — the statistical sibling of the exact-overlap
decontamination operator (decontam.py flags docs that ARE the
benchmark; DSIR up-weights docs that LOOK LIKE it).

Model (the paper's bag-of-hashed-ngrams importance estimator):

* features: unigrams + bigrams of whitespace tokens, hashed into
  ``N_BUCKETS`` buckets (multiplicity kept — these are counts, not the
  Jaccard word-set of P5).
* bucket distributions: add-one-smoothed frequencies for the target
  slice and the full corpus; per-bucket log-likelihood ratio
  ``ln(p_t(b)) - ln(p_q(b))``.
* per-doc log importance weight: sum of the ratio over the doc's gram
  occurrences.
* sampling: Gumbel noise derived from a per-doc hash (u in (0,1) ->
  ``-ln(-ln(u))``), ``selected = score >= corpus mean(score)`` where
  ``score = logw + gumbel``.  The paper's Gumbel TOP-K needs a global
  order; thresholding the SAME perturbed score at its corpus mean is
  the "resample the above-average-importance half" variant and keeps
  the stage one tiny scalar agg + a broadcast — the
  exact-top-k-under-a-budget shape already exists in
  selection.budget_selection's two-phase prefix sum.  The mean compare
  is done as ``score * N >= sum(score)`` so it stays exact integer
  decimal math in both engines (no decimal division).

Scale shape: one groupBy(bucket) over gram occurrences builds the
ratio table (<= N_BUCKETS rows after map-side combine — broadcast),
one groupBy(doc_id) sums ratios (map-side partial aggregation; the
ratio is a DECIMAL so partial-agg ORDER cannot drift the sum), and the
Gumbel/threshold step is per-row expressions.  No pair joins, no
windows, no Python.  At 10^12 docs the paper fits the two bucket
distributions on a subsample; here the full-corpus fit is itself just
the one tiny-keyed groupBy.

Cross-engine bit-parity contract: buckets and the Gumbel uniform come
from md5 (a built-in, codegen'd JVM expression that DuckDB can
re-derive exactly — production would swap in xxhash64 for the same
plan shape, but the arbitrary-length XXH64 SQL port is not worth the
oracle complexity; precedent: the green ``doc_fingerprint`` query).
Every ``ln`` output is rounded to 8 dp and cast to DECIMAL before any
arithmetic, so engine-specific last-ulp ``log`` differences vanish and
all sums/compares are exact integer math in both engines.  Counts are
exact BIGINTs.  Reference tie-in: the per-type workload estimator this
generalizes is A4 (main_cli.cpp:493-504) — "how much comparison work
does this slice attract" becomes "how target-like is this doc".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_BUCKETS = 4096
TARGET_MOD = 37  # doc_id % 37 == 0 -> the deterministic target slice
_RATIO_DEC = "decimal(12,8)"


def _grams(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, gram) with multiplicity: unigrams + bigrams of the
    lowercased whitespace tokens (array built-ins, no Python)."""
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda t: t != F.lit(""),
    )
    d = docs.select(id_col, toks.alias("ts"))
    bigrams = F.transform(
        F.sequence(F.lit(0), F.size("ts") - 2),
        lambda i: F.concat_ws(
            " ", F.element_at("ts", i + 1), F.element_at("ts", i + 2)
        ),
    )
    grams = F.when(
        F.size("ts") >= 2, F.concat("ts", bigrams)
    ).otherwise(F.col("ts"))
    return d.select(id_col, F.explode(grams).alias("gram"))


def _bucket(col: F.Column) -> F.Column:
    """md5-derived feature bucket in [0, N_BUCKETS) — exactly
    re-derivable in DuckDB (('0x'||substr(md5,1,8))::BIGINT)."""
    return F.pmod(
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long"),
        F.lit(N_BUCKETS),
    )


def _round_dec(col: F.Column) -> F.Column:
    return F.round(col, 8).cast(_RATIO_DEC)


def dsir_weights(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """docs -> (doc_id, n_grams, logw, gumbel, score, selected).

    ``logw``/``gumbel``/``score`` are doubles produced by exact decimal
    arithmetic (order-invariant); ``selected`` compares the decimal
    score against the corpus mean via ``score * N >= sum(score)``
    before any double cast.
    """
    g = _grams(docs, id_col, text_col).withColumn(
        "bucket", _bucket(F.col("gram"))
    )
    is_target = (F.col(id_col) % TARGET_MOD) == 0

    counts = g.groupBy("bucket").agg(
        F.count("*").alias("q_b"),
        F.sum(F.when(is_target, 1).otherwise(0)).alias("t_b"),
    )
    totals = counts.agg(
        F.sum("q_b").alias("Q"), F.sum("t_b").alias("T")
    )
    ratio = (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            _round_dec(
                F.log((F.col("t_b") + 1) / (F.col("T") + N_BUCKETS))
                - F.log((F.col("q_b") + 1) / (F.col("Q") + N_BUCKETS))
            ).alias("ratio"),
        )
    )

    per_doc = (
        g.join(F.broadcast(ratio), "bucket")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams"),
            F.sum("ratio").alias("logw_dec"),
        )
    )

    # deterministic per-doc Gumbel: u = (52-bit md5 prefix + 0.5)/2^52
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("dsir:"), F.col(id_col).cast("string"))),
                1,
                13,
            ),
            16,
            10,
        ).cast("double")
        + 0.5
    ) / F.lit(float(1 << 52))
    gumbel = _round_dec(-F.log(-F.log(u)))

    # every doc with >= 1 token appears in per_doc (a token IS a
    # unigram); the zero-token remainder is a MAP-ONLY filter — so no
    # docs-to-weights join is needed at all, just a union.
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda t: t != F.lit(""),
    )
    empties = docs.filter(F.size(toks) == 0).select(
        F.col(id_col),
        F.lit(0).cast("long").alias("n_grams"),
        F.lit(0).cast(_RATIO_DEC).alias("logw_dec"),
    )
    out = (
        per_doc.select(
            id_col, F.col("n_grams").cast("long").alias("n_grams"), "logw_dec"
        )
        .unionByName(empties)
        .select(id_col, "n_grams", "logw_dec", gumbel.alias("gumbel_dec"))
        .withColumn(
            "score_dec",
            (F.col("logw_dec") + F.col("gumbel_dec")).cast("decimal(23,8)"),
        )
        # compute-once (SE4): the scored table feeds both the scalar
        # stats agg and the final projection — at 10^12 docs you'd
        # checkpoint it to the stage ledger instead of re-deriving the
        # gram pipeline twice.
        .persist()
    )
    stats = out.agg(
        F.sum("score_dec").cast("decimal(33,8)").alias("S"),
        F.count("*").cast("decimal(13,0)").alias("N"),
    )
    return out.crossJoin(F.broadcast(stats)).select(
        id_col,
        "n_grams",
        F.col("logw_dec").cast("double").alias("logw"),
        F.col("gumbel_dec").cast("double").alias("gumbel"),
        F.col("score_dec").cast("double").alias("score"),
        (F.col("score_dec") * F.col("N") >= F.col("S")).alias("selected"),
    )


def dsir_weights_sql() -> str:
    """DuckDB twin over the registered ``documents`` view — same md5
    buckets, same add-one smoothing, same round-8 decimal arithmetic.
    Agreement proves the hashing, the distribution fit, and the
    order-invariant decimal-sum decomposition end to end."""
    return f"""
WITH docs0 AS MATERIALIZED (
  SELECT doc_id,
         list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                     t -> t <> '') AS ts
  FROM documents
),
grams AS (
  SELECT doc_id, unnest(ts) AS gram FROM docs0
  UNION ALL
  SELECT doc_id,
         unnest(list_transform(range(len(ts) - 1),
                               i -> ts[i + 1] || ' ' || ts[i + 2])) AS gram
  FROM docs0 WHERE len(ts) >= 2
),
g AS MATERIALIZED (
  SELECT doc_id,
         ('0x' || substr(md5(gram), 1, 8))::BIGINT % {N_BUCKETS} AS bucket
  FROM grams
),
counts AS (
  SELECT bucket, count(*) AS q_b,
         sum(CASE WHEN doc_id % {TARGET_MOD} = 0 THEN 1 ELSE 0 END) AS t_b
  FROM g GROUP BY bucket
),
totals AS (SELECT sum(q_b) AS Qt, sum(t_b) AS Tt FROM counts),
ratio AS (
  SELECT bucket,
         round(ln((t_b + 1)::DOUBLE / (Tt + {N_BUCKETS}))
             - ln((q_b + 1)::DOUBLE / (Qt + {N_BUCKETS})),
               8)::DECIMAL(12,8) AS ratio
  FROM counts, totals
),
per_doc AS (
  SELECT doc_id, count(*) AS n_grams, sum(ratio) AS logw_dec
  FROM g JOIN ratio USING (bucket) GROUP BY doc_id
),
gum AS (
  SELECT doc_id,
         round(-ln(-ln(
           (('0x' || substr(md5('dsir:' || doc_id::VARCHAR), 1, 13))::BIGINT
              ::DOUBLE + 0.5) / {float(1 << 52)!r}
         )), 8)::DECIMAL(12,8) AS gumbel_dec
  FROM documents
),
scored AS MATERIALIZED (
  SELECT d.doc_id,
         coalesce(p.n_grams, 0)::BIGINT AS n_grams,
         coalesce(p.logw_dec, 0::DECIMAL(12,8)) AS logw_dec,
         g.gumbel_dec,
         (coalesce(p.logw_dec, 0::DECIMAL(12,8)) + g.gumbel_dec)
           ::DECIMAL(23,8) AS score_dec
  FROM documents d
  LEFT JOIN per_doc p USING (doc_id)
  JOIN gum g USING (doc_id)
),
stats AS (
  SELECT sum(score_dec)::DECIMAL(33,8) AS S,
         count(*)::DECIMAL(13,0) AS N
  FROM scored
)
SELECT doc_id,
       n_grams,
       logw_dec::DOUBLE AS logw,
       gumbel_dec::DOUBLE AS gumbel,
       score_dec::DOUBLE AS score,
       (score_dec * N >= S) AS selected
FROM scored, stats
"""
