"""Sequence packing layout (E48): assign every document its byte-exact
slot in the concatenated fixed-window token stream a trainer consumes.

The standard LLM data-prep step after filtering/dedup: documents are
concatenated in a deterministic order with one EOS separator each and
cut into fixed ``window``-token training sequences (GPT-3 appx B;
T5/C4 "packing"). This operator computes, per document:

    cost      = n_tokens + 1                  (the trailing EOS)
    offset    = Σ cost of all docs before it  (order: doc_id asc)
    seq_start = offset // window
    seq_end   = (offset + cost - 1) // window (inclusive; docs span)

Scale shape: the exclusive prefix sum is NOT a global single-reducer
window — docs are ``repartitionByRange(doc_id)``, each partition does a
parallel local running sum (window keyed by spark_partition_id), and a
collected per-partition total table (tiny: one row per partition)
broadcasts the cumulative base offsets — the E26/E35 two-phase pattern.
The SQL oracle runs the naive global window; agreement proves the
decomposition exact.

Token counting = whitespace tokens (the engine's P5 tokenizer); empty
docs still cost 1 (their EOS occupies a slot — the trainer emits it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

WINDOW_TOKENS = 2048


def pack_sequences(
    docs: DataFrame,
    window: int = WINDOW_TOKENS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """docs -> (doc_id, n_tokens, cost, offset, seq_start, seq_end,
    n_seqs) with offsets from a distributed two-phase prefix sum."""
    spark = docs.sparkSession
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"),
        lambda t: t != F.lit(""),
    )
    costed = docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("long").alias("n_tokens"),
    ).withColumn("cost", F.col("n_tokens") + 1)

    p = spark.sparkContext.defaultParallelism
    parted = costed.repartitionByRange(p, "doc_id").withColumn(
        "__pid", F.spark_partition_id()
    )
    # ROWS frame, not the default RANGE frame: RANGE includes ORDER BY
    # peers, so duplicate doc_id values would sum all peers' costs and
    # diverge from the oracle's explicit ROWS ... CURRENT ROW frame
    local = (
        Window.partitionBy("__pid")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # exclusive local prefix: running sum minus own cost
    parted = parted.withColumn(
        "__lpre", F.sum("cost").over(local) - F.col("cost")
    ).persist()
    sizes = sorted(
        (r["__pid"], r["s"])
        for r in parted.groupBy("__pid")
        .agg(F.sum("cost").alias("s"))
        .collect()
    )
    offsets, acc = [], 0
    for pid, s in sizes:
        offsets.append((pid, acc))
        acc += int(s)
    off = spark.createDataFrame(offsets, "__pid int, __base long")
    out = (
        parted.join(F.broadcast(off), "__pid")
        .select(
            "doc_id",
            "n_tokens",
            "cost",
            (F.col("__lpre") + F.col("__base")).alias("offset"),
        )
        .select(
            "*",
            F.floor(F.col("offset") / window).cast("long").alias("seq_start"),
            F.floor((F.col("offset") + F.col("cost") - 1) / window)
            .cast("long")
            .alias("seq_end"),
        )
        .select(
            "*",
            (F.col("seq_end") - F.col("seq_start") + 1).alias("n_seqs"),
        )
    )
    return out


def pack_sequences_sql(
    window: int = WINDOW_TOKENS,
    docs_sql: str = "SELECT doc_id, text FROM documents",
) -> str:
    """DuckDB twin: the naive global-window exclusive prefix sum —
    agreement proves the two-phase distributed decomposition exact."""
    return f"""
WITH pk_in AS MATERIALIZED ({docs_sql}),
costed AS (
  SELECT doc_id,
         len(list_filter(string_split_regex(trim(text), '\\s+'),
                         t -> t <> ''))::BIGINT AS n_tokens
  FROM pk_in
),
pre AS (
  SELECT doc_id, n_tokens, n_tokens + 1 AS cost,
         coalesce(sum(n_tokens + 1) OVER (
           ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
           AS "offset"
  FROM costed
)
SELECT doc_id, n_tokens, cost, "offset",
       ("offset" // {window})::BIGINT AS seq_start,
       (("offset" + cost - 1) // {window})::BIGINT AS seq_end,
       (("offset" + cost - 1) // {window} - "offset" // {window} + 1)::BIGINT
         AS n_seqs
FROM pre
"""


# ------------------------------- deterministic shuffle + shard layout

SHARD_TOKENS = 1 << 14  # tokens per output shard (demo-sized)
SHUFFLE_MOD = 1 << 20  # must divide 2^64 (signed-pmod/unsigned-% parity)


def shard_layout(
    docs: DataFrame,
    shard_tokens: int = SHARD_TOKENS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic global shuffle + shard assignment (E66) — the step
    between selection and packing in a training-data run: documents
    must be SHUFFLED (no crawl-order locality in the training stream)
    yet deterministically (retries, re-runs, and resumed jobs must
    produce the identical stream), then laid out into fixed-size
    shards.

    The shuffle order is a pure function of the document key —
    ``(pmod(xxhash64('doc://%010d' % id), 2^20), doc_id)`` — the same
    hash-gate discipline as corpus_mix: no rand(), no
    zipWithIndex-style nondeterminism.  Every doc gets:

        offset    = Σ cost of docs BEFORE it in shuffle order
        shard_id  = offset // shard_tokens   (shard where it starts)
        shard_pos = offset %  shard_tokens

    with cost = n_tokens + 1 (the EOS, as in pack_sequences).

    Scale shape: ``repartitionByRange`` on the shuffle order gives
    contiguous ranges in partition-id order, each partition computes a
    local running sum in parallel, and a collected per-partition total
    table (one row per partition) broadcasts the cumulative bases —
    the same two-phase prefix sum as E26/E48, just over the SHUFFLED
    order instead of doc_id order."""
    spark = docs.sparkSession
    toks = F.filter(
        F.split(F.trim(F.col(text_col)), r"\s+"),
        lambda t: t != F.lit(""),
    )
    key = F.format_string("doc://%010d", F.col(id_col))
    costed = docs.select(
        F.col(id_col).alias("doc_id"),
        F.pmod(F.xxhash64(key), F.lit(SHUFFLE_MOD)).alias("shuffle_key"),
        F.size(toks).cast("long").alias("n_tokens"),
    ).withColumn("cost", F.col("n_tokens") + 1)

    p = spark.sparkContext.defaultParallelism
    parted = costed.repartitionByRange(
        p, "shuffle_key", "doc_id"
    ).withColumn("__pid", F.spark_partition_id())
    local = (
        Window.partitionBy("__pid")
        .orderBy("shuffle_key", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    parted = parted.withColumn(
        "__lpre", F.sum("cost").over(local) - F.col("cost")
    ).persist()
    sizes = sorted(
        (r["__pid"], r["s"])
        for r in parted.groupBy("__pid")
        .agg(F.sum("cost").alias("s"))
        .collect()
    )
    offsets, acc = [], 0
    for pid, s in sizes:
        offsets.append((pid, acc))
        acc += int(s)
    off = spark.createDataFrame(offsets, "__pid int, __base long")
    return (
        parted.join(F.broadcast(off), "__pid")
        .select(
            "doc_id",
            "shuffle_key",
            "n_tokens",
            "cost",
            (F.col("__lpre") + F.col("__base")).alias("offset"),
        )
        .select(
            "*",
            F.floor(F.col("offset") / shard_tokens)
            .cast("long")
            .alias("shard_id"),
            F.pmod(F.col("offset"), F.lit(shard_tokens))
            .cast("long")
            .alias("shard_pos"),
        )
    )


def shard_layout_sql(
    shard_tokens: int = SHARD_TOKENS,
    docs_sql: str = "SELECT doc_id, text FROM documents",
) -> str:
    """DuckDB twin: shuffle keys via the pinned XXH64 port, then the
    naive global-window exclusive prefix sum over the shuffled order."""
    from mediaduplicatefinder_spark.oracle.lsh_sql import xxh64_doc_key_cte

    keys = xxh64_doc_key_cte(
        "SELECT printf('doc://%010d', doc_id) AS url FROM sl_in"
    )
    return f"""
WITH sl_in AS MATERIALIZED ({docs_sql}),
keys AS MATERIALIZED ({keys}),
costed AS (
  SELECT d.doc_id,
         (k.dk % {SHUFFLE_MOD})::BIGINT AS shuffle_key,
         len(list_filter(string_split_regex(trim(d.text), '\\s+'),
                         t -> t <> ''))::BIGINT AS n_tokens
  FROM sl_in d
  JOIN keys k ON k.url = printf('doc://%010d', d.doc_id)
),
pre AS (
  SELECT doc_id, shuffle_key, n_tokens, n_tokens + 1 AS cost,
         coalesce(sum(n_tokens + 1) OVER (
           ORDER BY shuffle_key, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)::BIGINT
           AS "offset"
  FROM costed
)
SELECT doc_id, shuffle_key, n_tokens, cost, "offset",
       ("offset" // {shard_tokens})::BIGINT AS shard_id,
       ("offset" % {shard_tokens})::BIGINT AS shard_pos
FROM pre
"""
