"""Sorted-neighborhood candidate generation (E87, Hernandez & Stolfo
SIGMOD 1995).

The third candidate-generation family next to banding-LSH (E2/J1) and
inverted-index joins (E80): sort the corpus by a discriminating key and
pair each record with its w-1 successors.  Where LSH needs set overlap
and posting joins need a shared token, SNM catches the
"title-prefix" family — near-dups whose normalized openings coincide
(syndicated articles with edited tails, versioned pages) — at a cost
that is ONE sort plus a window, independent of pair density.

Key = first ``key_len`` chars of the lowercased alnum-collapsed text
(the P5 normalization family).  Neighbors are found with
``lead(...)`` over the (key, doc_id) order — no self-join; the sort is
the only shuffle, and Spark's range-partitioned global sort is exactly
the multi-pass external sort SNM was designed around.  A pair is
emitted when the two keys share a prefix of >= ``min_common`` chars
(the adaptive-SNM refinement: a window straddling unrelated keys emits
nothing) plus the engine's F2 size-ratio prefilter.

Determinism: pure string/integer rules; the window order
(key, doc_id) is total.  Every column the twin compares is either a
string, an int, or one rounded exact division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SNM_KEY_LEN = 20
SNM_WINDOW = 4
SNM_MIN_COMMON = 12
SNM_SIZE_RATIO = 0.5


def _snm_key(text_col: str, key_len: int) -> F.Column:
    return F.substring(
        F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9]+", ""),
        1,
        key_len,
    )


def sorted_neighborhood_pairs(
    docs: DataFrame,
    key_len: int = SNM_KEY_LEN,
    window: int = SNM_WINDOW,
    min_common: int = SNM_MIN_COMMON,
    size_ratio: float = SNM_SIZE_RATIO,
    text_col: str = "text",
) -> DataFrame:
    """docs(doc_id, text) ->
    (doc_a, doc_b, key_a, key_b, common_prefix, len_ratio)."""
    d = docs.select(
        "doc_id",
        _snm_key(text_col, key_len).alias("k"),
        F.length(text_col).cast("long").alias("n"),
    ).filter(F.length("k") > 0)

    # Distributed SNM: a range-partitioned sort gives the global
    # (k, doc_id) order with partitions globally contiguous, so
    # (1) within-partition lead() distances equal global distances, and
    # (2) the only missing pairs straddle a partition boundary — replay
    # them from the tail(w-1) + head(w-1) rows of adjacent partitions
    # (a globally contiguous 2(w-1) block), keeping only cross-pid
    # pairs (same-pid pairs were already emitted, and a lead() that
    # jumps between non-adjacent blocks is always same-pid).
    # Precondition: every partition holds >= window rows — true
    # whenever docs >> shuffle partitions; tests pin distributed ==
    # single-window reference across partition counts.
    srt = (
        d.repartitionByRange(F.col("k"), F.col("doc_id"))
        .sortWithinPartitions("k", "doc_id")
        .withColumn("pid", F.spark_partition_id())
        .persist()
    )

    def _lead_pairs(df: DataFrame, part_cols: list[str]) -> DataFrame:
        w = Window.partitionBy(*part_cols).orderBy(
            F.col("k").asc(), F.col("doc_id").asc()
        ) if part_cols else Window.orderBy(
            F.col("k").asc(), F.col("doc_id").asc()
        )
        leads = df.select(
            "doc_id",
            "k",
            "n",
            "pid",
            F.array(
                *[
                    F.struct(
                        F.lead("doc_id", i).over(w).alias("doc_b"),
                        F.lead("k", i).over(w).alias("key_b"),
                        F.lead("n", i).over(w).alias("n_b"),
                        F.lead("pid", i).over(w).alias("pid_b"),
                    )
                    for i in range(1, window)
                ]
            ).alias("nbrs"),
        )
        return (
            leads.select(
                F.col("doc_id").alias("doc_a"),
                F.col("k").alias("key_a"),
                F.col("n").alias("n_a"),
                F.col("pid").alias("pid_a"),
                F.explode("nbrs").alias("nb"),
            )
            .select(
                "doc_a",
                "key_a",
                "n_a",
                "pid_a",
                F.col("nb.doc_b").alias("doc_b"),
                F.col("nb.key_b").alias("key_b"),
                F.col("nb.n_b").alias("n_b"),
                F.col("nb.pid_b").alias("pid_b"),
            )
            .filter(F.col("doc_b").isNotNull())
        )

    inner = _lead_pairs(srt, ["pid"])
    rn_a = Window.partitionBy("pid").orderBy(
        F.col("k").asc(), F.col("doc_id").asc()
    )
    rn_d = Window.partitionBy("pid").orderBy(
        F.col("k").desc(), F.col("doc_id").desc()
    )
    boundary = (
        srt.withColumn("ra", F.row_number().over(rn_a))
        .withColumn("rd", F.row_number().over(rn_d))
        .filter((F.col("ra") < window) | (F.col("rd") < window))
        .select("doc_id", "k", "n", "pid")
    )
    cross = _lead_pairs(boundary, []).filter(
        F.col("pid_a") != F.col("pid_b")
    )
    e = inner.unionByName(cross).drop("pid_a", "pid_b")
    # prefix equality is monotone in i, so the common-prefix length is
    # the COUNT of i with substring(a,1,i) == substring(b,1,i) — an
    # O(key_len^2) scalar that both engines express identically
    common = F.expr(
        "aggregate(sequence(1, int(least(length(key_a), length(key_b)))),"
        " 0L, (acc, i) -> acc +"
        " IF(substring(key_a, 1, i) = substring(key_b, 1, i), 1L, 0L))"
    )
    ratio = F.round(
        F.least("n_a", "n_b") / F.greatest("n_a", "n_b"), 6
    )
    return (
        e.withColumn("common_prefix", common)
        .filter(
            (F.col("common_prefix") >= min_common)
            & (
                F.least("n_a", "n_b") / F.greatest("n_a", "n_b")
                >= F.lit(size_ratio)
            )
        )
        .select(
            "doc_a",
            "doc_b",
            "key_a",
            "key_b",
            "common_prefix",
            ratio.alias("len_ratio"),
        )
    )


def sorted_neighborhood_pairs_sql(
    docs_sql: str = "SELECT doc_id, text FROM documents",
    key_len: int = SNM_KEY_LEN,
    window: int = SNM_WINDOW,
    min_common: int = SNM_MIN_COMMON,
    size_ratio: float = SNM_SIZE_RATIO,
) -> str:
    ow = "(ORDER BY k ASC, doc_id ASC)"
    lead_rows = "\n    UNION ALL\n".join(
        f"""  SELECT doc_id AS doc_a, k AS key_a, n AS n_a,
         lead(doc_id, {i}) OVER {ow} AS doc_b,
         lead(k, {i}) OVER {ow} AS key_b,
         lead(n, {i}) OVER {ow} AS n_b
  FROM keyed"""
        for i in range(1, window)
    )
    return f"""
WITH snm_in AS ({docs_sql}),
keyed AS (
  SELECT doc_id,
         substr(regexp_replace(lower(text), '[^a-z0-9]+', '', 'g'),
                1, {key_len}) AS k,
         length(text)::BIGINT AS n
  FROM snm_in
  WHERE length(regexp_replace(lower(text), '[^a-z0-9]+', '', 'g')) > 0
),
cands AS (
{lead_rows}
),
scored AS (
  SELECT doc_a, doc_b, key_a, key_b, n_a, n_b,
         list_sum(list_transform(
           range(1, least(length(key_a), length(key_b)) + 1),
           i -> CASE WHEN substr(key_a, 1, i::INT)
                          = substr(key_b, 1, i::INT)
                     THEN 1 ELSE 0 END))::BIGINT AS common_prefix
  FROM cands WHERE doc_b IS NOT NULL
)
SELECT doc_a, doc_b, key_a, key_b, common_prefix,
       round(least(n_a, n_b) / greatest(n_a, n_b), 6) AS len_ratio
FROM scored
WHERE common_prefix >= {min_common}
  AND least(n_a, n_b) / greatest(n_a, n_b) >= {size_ratio!r}
"""
