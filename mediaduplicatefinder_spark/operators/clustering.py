"""Distributed connected components over the verified-pair edge list
(C2 replacement for the greedy star scan, main_cli.cpp:577-708 — see
SURVEY.md §2.6 for the recall argument: every reference (seed, member)
edge passes the same verify predicate, so CC preserves 100% of
reference dup pairs).

Algorithm: iterative min-label propagation (GraphFrames-style
large-star simplification): each node repeatedly adopts the minimum
label among itself and its neighbors' labels; converges in
O(diameter) rounds (near-dup components are near-cliques, so 2-4
rounds in practice). Each round is one shuffle join + one aggregate;
``localCheckpoint`` truncates lineage so plans stay O(1) per round.

cluster_id = min(url) of the component — stable and
partition-count-invariant (north_rule determinism).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mediaduplicatefinder_spark.config import DEFAULT_CONFIG, EngineConfig


def connected_components(
    edges: DataFrame, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """edges(url_a, url_b) -> labels(url, cluster_id), nodes with degree
    >= 1 only (size-1 groups are discarded, F3, main_cli.cpp:702-704)."""
    sym = (
        edges.select(F.col("url_a").alias("src"), F.col("url_b").alias("dst"))
        .unionByName(
            edges.select(F.col("url_b").alias("src"), F.col("url_a").alias("dst"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        sym.select(F.col("src").alias("url"))
        .distinct()
        .withColumn("cluster_id", F.col("url"))
        .localCheckpoint(eager=True)
    )

    for _ in range(cfg.cc_max_iterations):
        # (a) neighbor propagation: min label over the 1-hop neighborhood
        nbr = (
            sym.join(labels.withColumnRenamed("url", "dst"), "dst")
            .groupBy("src")
            .agg(F.min("cluster_id").alias("nbr_min"))
            .withColumnRenamed("src", "url")
        )
        stepped = (
            labels.join(nbr, "url", "left")
            .select(
                "url",
                F.least(
                    F.col("cluster_id"), F.coalesce("nbr_min", "cluster_id")
                ).alias("mid_id"),
                "cluster_id",
            )
        )
        # (b) pointer jumping: follow label -> label-of-label, halving path
        # length each round (chain-mode skew buckets create O(n) paths;
        # (a)+(b) converges in O(log n) rounds instead of O(n))
        lut = labels.select(
            F.col("url").alias("mid_id"), F.col("cluster_id").alias("jump_id")
        )
        updated = stepped.join(lut, "mid_id", "left").select(
            "url",
            F.least(F.col("mid_id"), F.coalesce("jump_id", "mid_id")).alias("new_id"),
            "cluster_id",
        )
        # ONE job per round: checkpoint materializes the join; the change
        # count then reads the checkpointed blocks only
        ck = updated.localCheckpoint(eager=True)
        changed = ck.filter(F.col("new_id") != F.col("cluster_id")).count()
        labels = ck.select("url", F.col("new_id").alias("cluster_id"))
        if changed == 0:
            break
    return labels
