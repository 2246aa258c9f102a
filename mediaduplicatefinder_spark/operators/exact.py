"""Exact-duplicate pass (A1/A3/C1/F3/F4; main_cli.cpp:488-575, 744-768).

sha2-256 over extracted text bytes is the group key — whole-stage
codegen, no Python. Grouping is a window over the hash (one shuffle on
``sha256``); the same shuffle serves cluster-id assignment, group-size
filter, survivor selection and keeper ordering, so the exact pass costs
exactly one exchange at any scale.

Scale note: the pipeline feeds this window SIGNATURE rows (sig-first
ordering, pipeline.py) — the ``text`` column is consumed map-side
before the exchange, so the one shuffle moves ~1 KB/doc, not documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_sha256(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Lowercase-hex SHA-256 of the utf-8 text bytes (main_cli.cpp:488-526;
    the engine standardizes the reference's platform-divergent fallback
    hash A2 away, SURVEY.md §2.3)."""
    return docs.withColumn("sha256", F.sha2(F.col(text_col).cast("binary"), 256))


def exact_groups(docs_with_sha: DataFrame) -> DataFrame:
    """Adds per-group bookkeeping columns over one hash shuffle:
    n_dups (group size), scan_rank (position in scan order = url order),
    cluster_id (min url — stable, partition-invariant)."""
    w = Window.partitionBy("sha256")
    wo = w.orderBy("url")
    return (
        docs_with_sha.withColumn("n_dups", F.count("*").over(w))
        .withColumn("scan_rank", F.row_number().over(wo))
        .withColumn("cluster_id", F.min("url").over(w))
    )


def exact_clusters(grouped: DataFrame) -> DataFrame:
    """clusters(url, cluster_id, kind='EXACT', score=1.0) for groups of
    size >= 2 (F3, main_cli.cpp:567-572)."""
    return grouped.filter(F.col("n_dups") >= 2).select(
        "url",
        "cluster_id",
        F.lit("EXACT").alias("kind"),
        F.lit(1.0).alias("score"),
        "sha256",
    )


def similarity_survivors(grouped: DataFrame) -> DataFrame:
    """Pass-2 universe: the scan-order-first member of every hash group
    (covers singletons, rank 1 trivially) — the anti-join F4/J5
    (main_cli.cpp:755-768) expressed as a rank filter on the same
    shuffle, no extra join."""
    return grouped.filter(F.col("scan_rank") == 1).drop(
        "n_dups", "scan_rank", "cluster_id"
    )
