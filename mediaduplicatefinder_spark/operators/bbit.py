"""b-bit MinHash signature compression (E78, Li & Koenig WWW 2010).

At 10^12 documents the full r*b minhash signature (128 x 8 bytes/doc)
is ~1 TB of state per corpus snapshot; storing only the lowest ``b``
bits of each permutation's minimum cuts that by 16x (b=4) while
keeping an unbiased resemblance estimate: if two sets have Jaccard J,
a b-bit slot matches with probability ``J + (1-J) * Cb`` where
``Cb ~= 2^-b`` (uniform-hash approximation of Li & Koenig's r1/r2
correction), so

    J_hat = (match_fraction - Cb) / (1 - Cb).

The operator scores existing LSH candidate pairs from BOTH codebooks:
the full signature (``mh_est = full_match / K``) and the compressed
one (``bbit_est``), making the compression error directly observable
per pair.  Slot comparison is a ``zip_with`` + ``aggregate`` over the
signature arrays — JVM-side, no explode, no extra shuffle beyond the
candidate join.

Determinism: slot equality is pure integer (low-b-bit mask on the
signed Spark value == ``mh % 2^b`` on the oracle's UBIGINT — a
power-of-two mod needs no signed reinterpretation); the two estimates
are single mirrored double expressions over exact integers and
Python-inlined literal constants.

Oracle: rides oracle/lsh_sql.lsh_base_cte — the same ``cand`` pair
relation and per-(url, permutation) ``mh`` table the minhash_lsh_pairs
twin verifies bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mediaduplicatefinder_spark.config import DEFAULT_CONFIG, EngineConfig
from mediaduplicatefinder_spark.oracle.lsh_sql import lsh_base_cte

BBIT_B = 4


def bbit_minhash_pairs(
    cands: DataFrame,
    sigs: DataFrame,
    cfg: EngineConfig = DEFAULT_CONFIG,
    b: int = BBIT_B,
) -> DataFrame:
    """cands(key_a, key_b) x sigs(url, doc_key, minhash) ->
    (url_a, url_b, full_match, bbit_match, mh_est, bbit_est).

    Pair identity travels as the 8-byte doc_key (the candidate table
    never carries urls — the pipeline's shuffle-width rule); urls are
    re-attached here and normalized to lexicographic order (match
    counts are symmetric, so the swap is free)."""
    k = cfg.num_perm
    mask = (1 << b) - 1
    cb = 1.0 / (1 << b)
    sa = sigs.select(
        F.col("doc_key").alias("key_a"),
        F.col("url").alias("ua"),
        F.col("minhash").alias("ma"),
    )
    sb = sigs.select(
        F.col("doc_key").alias("key_b"),
        F.col("url").alias("ub"),
        F.col("minhash").alias("mb"),
    )
    j = (
        cands.select("key_a", "key_b")
        .join(sa, "key_a")
        .join(sb, "key_b")
        .select(
            F.least("ua", "ub").alias("url_a"),
            F.greatest("ua", "ub").alias("url_b"),
            F.expr(
                "aggregate(zip_with(ma, mb, (x, y) -> IF(x = y, 1L, 0L)),"
                " 0L, (a, v) -> a + v)"
            ).alias("full_match"),
            F.expr(
                f"aggregate(zip_with(ma, mb, (x, y) ->"
                f" IF((x & {mask}L) = (y & {mask}L), 1L, 0L)),"
                " 0L, (a, v) -> a + v)"
            ).alias("bbit_match"),
        )
    )
    return j.select(
        "url_a",
        "url_b",
        "full_match",
        "bbit_match",
        (F.col("full_match") / F.lit(k)).alias("mh_est"),
        (
            ((F.col("bbit_match") / F.lit(k)) - F.lit(cb))
            / F.lit(1.0 - cb)
        ).alias("bbit_est"),
    )


def bbit_minhash_pairs_sql(
    cfg: EngineConfig = DEFAULT_CONFIG, b: int = BBIT_B
) -> str:
    k = cfg.num_perm
    cb = 1.0 / (1 << b)
    return (
        lsh_base_cte(cfg)
        + f""",
bm AS (
  SELECT c.url_a, c.url_b,
         sum(CASE WHEN x.mh = y.mh THEN 1 ELSE 0 END)::BIGINT
           AS full_match,
         sum(CASE WHEN x.mh % {1 << b} = y.mh % {1 << b}
                  THEN 1 ELSE 0 END)::BIGINT AS bbit_match
  FROM cand c
  JOIN mh x ON x.url = c.url_a
  JOIN mh y ON y.url = c.url_b AND y.i = x.i
  GROUP BY c.url_a, c.url_b
)
SELECT url_a, url_b, full_match, bbit_match,
       full_match / {k} AS mh_est,
       ((bbit_match / {k}) - {cb!r}) / {1.0 - cb!r} AS bbit_est
FROM bm
"""
    )
