"""Aggregate rollups (A4-A7; main_cli.cpp:581-591, 770-779;
duplicate_gui.py:418-485). All built-in hash aggregates — partial
(map-side) + final, no Python."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def per_lang_workload(docs: DataFrame) -> DataFrame:
    """A4: per-type counts + the C(n,2) pairwise workload the reference
    would have executed (TOTAL_WORK, main_cli.cpp:770-779)."""
    return (
        docs.groupBy("lang")
        .agg(F.count("*").alias("n_docs"))
        .withColumn("n_pairs", (F.col("n_docs") * (F.col("n_docs") - 1) / 2).cast("long"))
        .orderBy("lang")
    )


def wasted_space(exact_clusters_with_size: DataFrame) -> DataFrame:
    """A5 (duplicate_gui.py:418-440): per EXACT group, size of the first
    (kept) member times (n-1) redundant copies; grand total."""
    per_group = exact_clusters_with_size.groupBy("cluster_id").agg(
        ((F.count("*") - 1) * F.min("size_bytes")).alias("wasted_bytes"),
        F.count("*").alias("n_members"),
    )
    return per_group.agg(
        F.count("*").alias("n_groups"),
        F.sum("wasted_bytes").alias("total_wasted_bytes"),
        F.sum("n_members").alias("n_member_files"),
    )


def stats_rollup(clusters: DataFrame) -> DataFrame:
    """A6 (duplicate_gui.py:444-485): group/member counts per kind."""
    return (
        clusters.groupBy("kind")
        .agg(
            F.countDistinct("cluster_id").alias("n_groups"),
            F.count("*").alias("n_files"),
        )
        .orderBy("kind")
    )


def with_group_avg_score(clusters: DataFrame) -> DataFrame:
    """A7 (main_cli.cpp:787-792): per-cluster arithmetic mean of member
    scores, carried on every member row."""
    w = Window.partitionBy("cluster_id")
    return clusters.withColumn("group_avg_score", F.avg("score").over(w))


def humanize_bytes_expr(col: F.Column) -> F.Column:
    """X8 (duplicate_gui.py:474-480): KB/MB/GB ladder, display only."""
    b = col.cast("double")
    return (
        F.when(b >= 1024**3, F.concat(F.format_number(b / 1024**3, 2), F.lit(" GB")))
        .when(b >= 1024**2, F.concat(F.format_number(b / 1024**2, 2), F.lit(" MB")))
        .when(b >= 1024, F.concat(F.format_number(b / 1024, 2), F.lit(" KB")))
        .otherwise(F.concat(F.format_number(b, 0), F.lit(" B")))
    )
