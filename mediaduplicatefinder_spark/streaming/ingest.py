"""Structured Streaming ingestion for the dedup engine.

The reference is a batch tool (SURVEY.md §2.10: no streaming
operators) — this module is an ENGINE EXTENSION covering the streaming
half of a production webtext pipeline: pages land continuously (e.g. a
WARC-unpacker dropping parquet files), and the engine maintains:

- ``streaming_exact_dedup``  exact-duplicate suppression across ALL
  batches seen so far (stateful ``dropDuplicates`` on the sha256 text
  hash — the A1 key, main_cli.cpp:488-526, as streaming state);
- ``streaming_lang_rates``   per-lang arrival counts in event-time
  windows with a watermark for late data.

Batch parity: a row survives streaming dedup iff it would be the
scan-order-first member of its hash group in the batch pipeline
(operators/exact.py) run over the same accumulated input — asserted in
tests/test_streaming.py via trigger(availableNow) replays.

At scale the state store is RocksDB-backed
(``spark.sql.streaming.stateStore.providerClass``); state size is one
(sha256, url) entry per distinct page, the same cardinality the batch
exact pass shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

PAGES_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def read_pages_stream(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int = 16
) -> DataFrame:
    """File-source stream of pages parquet drops (each micro-batch
    processes up to max_files_per_trigger new files)."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def streaming_exact_dedup(pages: DataFrame) -> DataFrame:
    """First-seen page per distinct text (stateful exact dedup).

    State = one entry per distinct sha256; within a micro-batch the
    retained row is resolved by Spark's dropDuplicates (arbitrary within
    the batch, stable across replays with availableNow ordering) — the
    streaming analog of the batch pass-2 survivor rule
    (operators/exact.py similarity_survivors)."""
    hashed = pages.withColumn(
        "sha256", F.sha2(F.col("text").cast("binary"), 256)
    )
    return hashed.dropDuplicates(["sha256"]).select(
        "url", "warc_ts", "lang", "sha256", F.octet_length("text").alias("size_bytes")
    )


def streaming_lang_rates(
    pages: DataFrame, window: str = "1 minute", watermark: str = "2 minutes"
) -> DataFrame:
    """Per-lang page counts in event-time windows (progress/lineage
    metrics as a live stream — the S11b progress-sink role,
    main_cli.cpp:556-557, upgraded from stderr lines to a table)."""
    return (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "lang")
        .agg(F.count("*").alias("n_pages"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "lang",
            "n_pages",
        )
    )


def run_to_memory(
    stream: DataFrame, query_name: str, checkpoint_dir: str, output_mode: str
):
    """Drain all available input into an in-memory table (single-shot
    demos; the memory sink cannot RESUME from a checkpoint — use
    :func:`run_to_parquet` for restartable queries)."""
    return (
        stream.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def run_to_parquet(stream: DataFrame, out_dir: str, checkpoint_dir: str):
    """Restartable sink: append to parquet with exactly-once file commits
    via the checkpoint (the production shape; an Iceberg deployment swaps
    ``format("iceberg")`` with the same checkpoint contract)."""
    return (
        stream.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
