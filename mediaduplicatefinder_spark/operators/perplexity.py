"""CCNet LM perplexity buckets (E46, Wenzek et al. 2020,
arXiv:1911.00359 §3.3): the third stage of the CCNet trio — after
lang-ID (E11) and paragraph dedup (E40), each document is scored by a
per-language target-trained LM and split into head / middle / tail
quality buckets by perplexity terciles.

Model — a bucketed bigram LM standing in for CCNet's KenLM 5-gram
(same decision shape, sandbox-expressible, cross-engine verifiable):

* tokens: lowercased whitespace tokens (the DSIR/E32 tokenizer);
  each token hashed to an md5 bucket in [0, N_BUCKETS).
* fit (per lang, TARGET slice only — doc_id % TARGET_MOD == 0, the
  deterministic Wikipedia stand-in): context counts C(lang, b1) and
  pair counts c(lang, b1, b2).
* score: lp(w1 w2) = ln((c+1) / (C + N_BUCKETS)) — add-one smoothing,
  unseen contexts degrade to ln(1/N_BUCKETS).
* per-doc cross-entropy ce = -Σ lp / n_bigrams; buckets =
  per-lang ntile(3) ordered by (ce, doc_id): head = lowest ce.

Cross-engine bit-parity (the E32 contract): every ``ln`` output is
rounded to 8 dp and cast to DECIMAL before summing, so partial-agg
order cannot drift; the per-doc sum stays < 13 significant digits so
its double cast is exact in both engines, and ce is one IEEE division
of exact values — the ntile ORDER BY is therefore identical in Spark
and DuckDB. Docs with < 2 tokens get bucket 'na' (ce 0.0) via a
map-only union, never entering the terciles.

Scale shape: gram explode is map-only; the model fit is one
tiny-keyed groupBy (≤ live (lang,b1,b2) triples of the TARGET slice —
broadcast); scoring is two broadcast left joins + one
map-side-combining groupBy(doc). The tercile split is a per-lang
window — the CCNet semantic itself (per-lang thresholds); at 10^12
docs you'd compute the two thresholds from a sample and broadcast
them (CCNet does exactly this: cutoffs are computed once and shipped
as constants), keeping the stage map-only — the ntile twin here is
the oracle-checkable variant of that decision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

N_BUCKETS = 4096
TARGET_MOD = 11  # doc_id % 11 == 0 -> deterministic target slice
_LP_DEC = "decimal(12,8)"


def _bucket(col: F.Column) -> F.Column:
    """md5-derived token bucket — re-derivable in DuckDB as
    ('0x'||substr(md5(x),1,8))::BIGINT % N (the E32 bucket)."""
    return F.pmod(
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long"),
        F.lit(N_BUCKETS),
    )


def _toks(text_col: str) -> F.Column:
    return F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda t: t != F.lit(""),
    )


def perplexity_buckets(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """docs -> (doc_id, lang, n_bigrams, ce, bucket) with bucket in
    head/middle/tail (per-lang perplexity terciles) or na (< 2
    tokens)."""
    base = docs.select(id_col, lang_col, _toks(text_col).alias("ts"))
    grams = (
        base.filter(F.size("ts") >= 2)
        .select(
            id_col,
            lang_col,
            "ts",
            F.explode(F.sequence(F.lit(1), F.size("ts") - 1)).alias("i"),
        )
        .select(
            id_col,
            lang_col,
            _bucket(F.element_at("ts", F.col("i"))).alias("b1"),
            _bucket(F.element_at("ts", F.col("i") + 1)).alias("b2"),
        )
    )
    target = grams.filter((F.col(id_col) % TARGET_MOD) == 0)
    pair_counts = target.groupBy(lang_col, "b1", "b2").agg(
        F.count("*").alias("c")
    )
    ctx_counts = target.groupBy(lang_col, "b1").agg(
        F.count("*").alias("ctx")
    )

    lp = F.round(
        F.log(
            (F.coalesce(F.col("c"), F.lit(0)) + 1)
            / (F.coalesce(F.col("ctx"), F.lit(0)) + N_BUCKETS)
        ),
        8,
    ).cast(_LP_DEC)
    per_doc = (
        grams.join(F.broadcast(pair_counts), [lang_col, "b1", "b2"], "left")
        .join(F.broadcast(ctx_counts), [lang_col, "b1"], "left")
        .select(id_col, lang_col, lp.alias("lp"))
        .groupBy(id_col, lang_col)
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.sum("lp").alias("lp_sum"),
        )
    )
    # exact-value double: |lp_sum| < 1e5 at 8 dp -> exact in float64 in
    # both engines; one IEEE division makes the ORDER BY identical
    ce = -F.col("lp_sum").cast("double") / F.col("n_bigrams")
    scored = per_doc.select(id_col, lang_col, "n_bigrams", ce.alias("ce"))
    w = Window.partitionBy(lang_col).orderBy("ce", id_col)
    tiled = scored.select(
        "*",
        F.element_at(
            F.array(F.lit("head"), F.lit("middle"), F.lit("tail")),
            F.ntile(3).over(w),
        ).alias("bucket"),
    )
    na = docs.select(id_col, lang_col, _toks(text_col).alias("ts")).filter(
        F.size("ts") < 2
    ).select(
        id_col,
        lang_col,
        F.lit(0).cast("long").alias("n_bigrams"),
        F.lit(0.0).alias("ce"),
        F.lit("na").alias("bucket"),
    )
    return tiled.unionByName(na)


def perplexity_buckets_sql(
    docs_sql: str = "SELECT doc_id, lang, text FROM documents",
) -> str:
    """DuckDB twin over ``docs_sql`` (must yield doc_id, lang, text) —
    same md5 buckets, smoothing, round-8 decimal sum, and ntile tercile
    split. Agreement proves the LM fit, the order-invariant decimal
    decomposition, AND that the ce ORDER BY is bit-identical across
    engines."""
    return f"""
WITH pp_in AS MATERIALIZED ({docs_sql}),
docs0 AS MATERIALIZED (
  SELECT doc_id, lang,
         list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                     t -> t <> '') AS ts
  FROM pp_in
),
grams AS MATERIALIZED (
  -- aligned parallel unnest over the scalar range list (the lateral
  -- range table function cannot take column parameters)
  SELECT doc_id, lang,
         unnest(list_transform(range(1, len(ts)),
           i -> ('0x' || substr(md5(ts[i]), 1, 8))::BIGINT % {N_BUCKETS}))
           AS b1,
         unnest(list_transform(range(1, len(ts)),
           i -> ('0x' || substr(md5(ts[i + 1]), 1, 8))::BIGINT % {N_BUCKETS}))
           AS b2
  FROM docs0
  WHERE len(ts) >= 2
),
pair_counts AS (
  SELECT lang, b1, b2, count(*) AS c FROM grams
  WHERE doc_id % {TARGET_MOD} = 0 GROUP BY lang, b1, b2
),
ctx_counts AS (
  SELECT lang, b1, count(*) AS ctx FROM grams
  WHERE doc_id % {TARGET_MOD} = 0 GROUP BY lang, b1
),
per_doc AS (
  SELECT g.doc_id, g.lang, count(*)::BIGINT AS n_bigrams,
         sum(round(ln((coalesce(p.c, 0) + 1)::DOUBLE
                      / (coalesce(x.ctx, 0) + {N_BUCKETS})),
                   8)::DECIMAL(12,8)) AS lp_sum
  FROM grams g
  LEFT JOIN pair_counts p ON g.lang = p.lang AND g.b1 = p.b1 AND g.b2 = p.b2
  LEFT JOIN ctx_counts x ON g.lang = x.lang AND g.b1 = x.b1
  GROUP BY g.doc_id, g.lang
),
scored AS (
  SELECT doc_id, lang, n_bigrams,
         -(lp_sum::DOUBLE) / n_bigrams AS ce
  FROM per_doc
),
tiled AS (
  SELECT doc_id, lang, n_bigrams, ce,
         (['head', 'middle', 'tail'])[
           ntile(3) OVER (PARTITION BY lang ORDER BY ce, doc_id)] AS bucket
  FROM scored
)
SELECT * FROM tiled
UNION ALL
SELECT doc_id, lang, 0::BIGINT, 0.0, 'na'
FROM docs0 WHERE len(ts) < 2
"""
