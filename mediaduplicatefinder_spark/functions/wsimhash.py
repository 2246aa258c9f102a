"""Term-frequency-weighted SimHash (E79, Charikar STOC 2002 as deployed
in Manku/Jain/Sarma WWW 2007).

The pipeline's P3/E3 simhash channel votes each DISTINCT token once —
the reference's word-set semantics.  Manku's production variant weights
each token's +/-1 vote by its term frequency, which separates documents
that share vocabulary but differ in emphasis (boilerplate-heavy pages
collapse toward the boilerplate fingerprint; weighting resists that).
Summing +/-1 per OCCURRENCE equals summing tf * (+/-1) per distinct
token, so the Spark side needs no tf aggregation at all: one map-only
projection of nested higher-order array functions (transform ->
xxhash64 -> 64-lane vote accumulator -> bit assembly), whole-stage
codegen, zero shuffle, zero UDF.

Determinism contract: token hash = Spark ``xxhash64`` over the E64
fixed-16-byte word key (``wsh:`` + 13-char left-justified truncation),
so the DuckDB twin rides the pinned XXH64 port.  Bit j is set iff the
weighted vote is STRICTLY positive (ties -> 0).  The 64-bit fingerprint
is assembled in two's complement: Spark sums ``shiftleft(1L, j)``
(j=63 lands on the sign bit exactly); the twin sums HUGEINT powers and
signed-reinterprets.

The twin aggregates per distinct (doc, word) with tf weights — the
equivalent formulation — so the oracle check also proves the
occurrence-sum == tf-weighted-sum identity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mediaduplicatefinder_spark.oracle.lsh_sql import xxh64_doc_key_cte

WSH_PREFIX = "wsh:"
WSH_WORD_WIDTH = 12  # 4 + 12 = 16 bytes, the pinned XXH64 input shape


def weighted_simhash(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """docs(doc_id, text) -> (doc_id, n_words, wsimhash)."""
    expr = f"""
aggregate(
  transform(
    filter(split(lower({text_col}), '[^a-z0-9]+'), w -> w != ''),
    w -> xxhash64(format_string(
           '{WSH_PREFIX}%-{WSH_WORD_WIDTH}.{WSH_WORD_WIDTH}s', w))
  ),
  array_repeat(0L, 64),
  (acc, h) -> transform(
    acc, (v, j) -> v + 2 * (shiftrightunsigned(h, j) & 1L) - 1L),
  acc -> aggregate(
    transform(acc, (v, j) -> IF(v > 0, shiftleft(1L, j), 0L)),
    0L, (a, x) -> a + x)
)
"""
    n_words = F.size(
        F.filter(
            F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
            lambda w: w != "",
        )
    ).cast("long")
    return docs.select(
        "doc_id",
        n_words.alias("n_words"),
        F.expr(expr).alias("wsimhash"),
    )


def weighted_simhash_sql(
    docs_sql: str = "SELECT doc_id, text FROM documents",
) -> str:
    """DuckDB twin: tf-weighted votes over distinct words through the
    pinned XXH64 port."""
    keys = xxh64_doc_key_cte("SELECT url FROM uniq")
    return f"""
WITH ws_in AS MATERIALIZED ({docs_sql}),
toks AS (
  SELECT doc_id,
         printf('{WSH_PREFIX}%-{WSH_WORD_WIDTH}.{WSH_WORD_WIDTH}s', w)
           AS url
  FROM (
    SELECT doc_id,
           unnest(list_filter(
             string_split_regex(lower(text), '[^a-z0-9]+'),
             p -> p <> '')) AS w
    FROM ws_in
  )
),
tf AS (
  SELECT doc_id, url, count(*)::BIGINT AS tf
  FROM toks GROUP BY doc_id, url
),
uniq AS (SELECT DISTINCT url FROM tf),
keys AS MATERIALIZED ({keys}),
votes AS (
  SELECT t.doc_id, b.j,
         sum(t.tf * (2 * ((k.dk >> b.j) & 1)::BIGINT - 1))::BIGINT AS v
  FROM tf t JOIN keys k USING (url),
       unnest(range(0, 64)) AS b(j)
  GROUP BY t.doc_id, b.j
),
fps AS (
  SELECT doc_id,
         sum(CASE WHEN v > 0 THEN (1::HUGEINT << j)
                  ELSE 0::HUGEINT END) AS s
  FROM votes GROUP BY doc_id
),
nw AS (
  SELECT doc_id, count(*)::BIGINT AS n_words FROM toks GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(n.n_words, 0) AS n_words,
       coalesce(
         (CASE WHEN f.s >= {1 << 63} THEN f.s - {1 << 64}
               ELSE f.s END)::BIGINT, 0) AS wsimhash
FROM ws_in d
LEFT JOIN nw n USING (doc_id)
LEFT JOIN fps f USING (doc_id)
"""
