"""Hashed-feature linear quality classifier (E64) — the fastText-style
scoring stage CCNet / RedPajama / RefinedWeb run over extracted text
(a linear model over hashed bag-of-words features; Joulin et al. 2016).

What is real here is the PLUMBING a 100 TB run needs, end to end:

* tokenization to ASCII word features (lowercase, [a-z0-9]+ runs) —
  one codegen ``split``/``filter``, no Python;
* the **hashing trick**: each word maps to a bucket via the engine's
  ``xxhash64`` over a FIXED-WIDTH 16-byte key (``ft:`` + the word
  padded/truncated to 13 chars) — fixed width because the repo's
  pinned XXH64 SQL twin (oracle/lsh_sql.xxh64_doc_key_cte) covers
  exactly the 16-byte small-input path, and because fixed-width keys
  are how a production feature hasher avoids per-length code paths;
  truncation collisions are the hashing trick's normal bucketing;
* vectorized scoring: weight(bucket) = pmod(hash, 2048) - 1024 — the
  modulus MUST divide 2^64 so Spark's signed pmod and the oracle's
  unsigned ``%`` agree bit-for-bit (the corpus_mix MIX_MODULUS rule);
  the per-doc score is an integer SUM of weights (exact in both
  engines), normalized once at the end by 1024*n_words (one IEEE
  division, correctly rounded, identical cross-engine);
* the decision: ``keep = score_int >= 0`` — an integer compare, so the
  gate itself carries zero float risk.

The hash-derived weights stand in for trained coefficients — a real
deployment broadcasts a (bucket -> weight) map-typed literal or joins
a tiny weight table; score shape, key construction, and the integer
gate are unchanged.  Everything is map-only: at 10^12 docs this stage
causes NO data motion at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HASH_BUCKETS = 2048  # must divide 2^64 (signed-pmod / unsigned-% parity)
KEY_PREFIX = "ft:"
KEY_WORD_WIDTH = 13  # 3 + 13 = 16 bytes, the pinned XXH64 input shape


def _words(text: Column) -> Column:
    return F.filter(
        F.split(F.lower(text), "[^a-z0-9]+"), lambda w: w != ""
    )


def quality_classifier(
    docs: DataFrame,
    weights: dict[str, int] | None = None,
    weight_scale: int = HASH_BUCKETS // 2,
) -> DataFrame:
    """docs(doc_id, text) -> (doc_id, n_words, score_int, score, keep).

    Two weight modes, same score shape, key construction, and integer
    gate (round-5 VERDICT item 6):

    * ``weights=None`` (the oracle-parity fallback): score_int = sum
      over words of (pmod(xxhash64(key(word)), 2048) - 1024) — the
      hash-derived stand-in, bit-matched by the DuckDB twin's pinned
      XXH64 port.
    * ``weights={term: int}`` (the deployment mode): TRAINED
      integer-scaled coefficients looked up per word from a map
      literal compiled into the plan (terms beyond a literal's
      comfort — ~10^5 — broadcast-join a (term, weight) table
      instead; the score tail is identical).  Out-of-vocabulary words
      weigh 0, the fastText convention.

    score = score_int / (weight_scale * n_words); keep =
    score_int >= 0 — an integer compare either way.  One map-only
    projection, whole-stage codegen (higher-order array functions
    over the split — no UDF, no shuffle)."""
    words = _words(F.col("text"))
    if weights is None:
        keys = F.transform(
            words,
            lambda w: F.format_string(
                f"{KEY_PREFIX}%-{KEY_WORD_WIDTH}.{KEY_WORD_WIDTH}s", w
            ),
        )
        wcol = F.transform(
            keys,
            lambda k: F.pmod(F.xxhash64(k), F.lit(HASH_BUCKETS))
            - HASH_BUCKETS // 2,
        )
    else:
        wmap = F.create_map(
            *[
                F.lit(x)
                for term, wt in sorted(weights.items())
                for x in (term, int(wt))
            ]
        ) if weights else F.create_map().cast("map<string,int>")
        wcol = F.transform(
            words,
            lambda w: F.coalesce(
                F.element_at(wmap, w).cast("long"), F.lit(0).cast("long")
            ),
        )
    score_int = F.aggregate(
        wcol, F.lit(0).cast("long"), lambda a, x: a + x
    )
    n = F.size(words).cast("long")
    return docs.select(
        "doc_id",
        n.alias("n_words"),
        score_int.alias("score_int"),
        F.when(n > 0, F.round(score_int / (n * float(weight_scale)), 9))
        .otherwise(F.lit(0.0))
        .alias("score"),
        (score_int >= 0).alias("keep"),
    )


def quality_classifier_sql(
    docs_sql: str = "SELECT doc_id, text FROM documents",
    weights: dict[str, int] | None = None,
    weight_scale: int = HASH_BUCKETS // 2,
) -> str:
    """DuckDB twin: per-word keys through the pinned XXH64 port
    (distinct words hashed once, joined back per occurrence); with
    ``weights``, the trained mode's twin — the same tokens LEFT JOIN a
    VALUES weight table, OOV coalesced to 0."""
    from mediaduplicatefinder_spark.oracle.lsh_sql import xxh64_doc_key_cte

    half = HASH_BUCKETS // 2
    if weights is not None:
        vals = ", ".join(
            f"('{t}', {int(w)})"
            for t, w in sorted(weights.items())
        ) or "('', 0)"
        return f"""
WITH qc_in AS MATERIALIZED ({docs_sql}),
wt(term, w) AS (VALUES {vals}),
toks AS (
  SELECT doc_id,
         unnest(list_filter(
           string_split_regex(lower(text), '[^a-z0-9]+'),
           p -> p <> '')) AS term
  FROM qc_in
),
per_doc AS (
  SELECT t.doc_id,
         count(*)::BIGINT AS n_words,
         sum(coalesce(wt.w, 0))::BIGINT AS score_int
  FROM toks t LEFT JOIN wt USING (term)
  GROUP BY t.doc_id
)
SELECT d.doc_id,
       coalesce(p.n_words, 0)::BIGINT AS n_words,
       coalesce(p.score_int, 0)::BIGINT AS score_int,
       CASE WHEN coalesce(p.n_words, 0) > 0
            THEN round(p.score_int / (p.n_words * {float(weight_scale)}), 9)
            ELSE 0.0 END AS score,
       coalesce(p.score_int, 0) >= 0 AS keep
FROM qc_in d LEFT JOIN per_doc p USING (doc_id)
"""
    keys = xxh64_doc_key_cte("SELECT url FROM uniq")
    return f"""
WITH qc_in AS MATERIALIZED ({docs_sql}),
toks AS (
  SELECT doc_id,
         printf('{KEY_PREFIX}%-{KEY_WORD_WIDTH}.{KEY_WORD_WIDTH}s', w)
           AS url
  FROM (
    SELECT doc_id,
           unnest(list_filter(
             string_split_regex(lower(text), '[^a-z0-9]+'),
             p -> p <> '')) AS w
    FROM qc_in
  )
),
uniq AS (SELECT DISTINCT url FROM toks),
keys AS MATERIALIZED ({keys}),
per_doc AS (
  SELECT t.doc_id,
         count(*)::BIGINT AS n_words,
         sum((k.dk % {HASH_BUCKETS})::BIGINT - {half})::BIGINT AS score_int
  FROM toks t JOIN keys k USING (url)
  GROUP BY t.doc_id
)
SELECT d.doc_id,
       coalesce(p.n_words, 0)::BIGINT AS n_words,
       coalesce(p.score_int, 0)::BIGINT AS score_int,
       CASE WHEN coalesce(p.n_words, 0) > 0
            THEN round(p.score_int / (p.n_words * {float(half)}), 9)
            ELSE 0.0 END AS score,
       coalesce(p.score_int, 0) >= 0 AS keep
FROM qc_in d LEFT JOIN per_doc p USING (doc_id)
"""
