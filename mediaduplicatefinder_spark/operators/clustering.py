"""Distributed connected components over the verified-pair edge list
(C2 replacement for the greedy star scan, main_cli.cpp:577-708 — see
SURVEY.md §2.6 for the recall argument: every reference (seed, member)
edge passes the same verify predicate, so CC preserves 100% of
reference dup pairs).

Algorithm: iterative min-label propagation with pointer jumping
(GraphFrames-style large-star simplification). Each CHECKPOINT ROUND
runs TWO propagation hops + one pointer jump inside a single lineage,
then one ``localCheckpoint`` and one convergence count — near-clique
components converge in 1-2 rounds, chain-mode skew buckets in
O(log diameter), and the job count per round stays constant (the
driver-side loop is the serial floor of the whole pipeline, so rounds
are engineered to be few and cheap).

AQE is suspended inside the loop: label tables are tiny relative to
the corpus, and AQE's per-shuffle query-stage materialization triples
the job count for zero benefit at this size; the fixed
``cc_shuffle_partitions`` keeps the loop's exchanges small.

cluster_id = min(url) of the component — stable and
partition-count-invariant (north_rule determinism).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mediaduplicatefinder_spark.config import DEFAULT_CONFIG, EngineConfig


def _propagate(sym: DataFrame, labels: DataFrame) -> DataFrame:
    """One hop: each node adopts min(own label, neighbors' labels).

    Message-passing form — neighbor messages unioned with the self
    label, ONE groupBy: 2 exchanges per hop (labels to the join key,
    then the aggregate), vs 4 for the join-back formulation. sym is
    pre-partitioned on dst by the caller, so its side of the join
    reuses the existing exchange every round."""
    msgs = sym.join(labels.withColumnRenamed("url", "dst"), "dst").select(
        F.col("src").alias("url"), "cluster_id"
    )
    return (
        msgs.unionByName(labels)
        .groupBy("url")
        .agg(F.min("cluster_id").alias("cluster_id"))
    )


def connected_components(
    edges: DataFrame, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """edges(url_a, url_b) -> labels(url, cluster_id), nodes with degree
    >= 1 only (size-1 groups are discarded, F3, main_cli.cpp:702-704)."""
    spark = edges.sparkSession
    conf = spark.conf
    aqe_before = conf.get("spark.sql.adaptive.enabled")
    shuf_before = conf.get("spark.sql.shuffle.partitions")
    conf.set("spark.sql.adaptive.enabled", "false")
    conf.set("spark.sql.shuffle.partitions", str(cfg.cc_shuffle_partitions))
    try:
        sym = (
            edges.select(F.col("url_a").alias("src"), F.col("url_b").alias("dst"))
            .unionByName(
                edges.select(F.col("url_b").alias("src"), F.col("url_a").alias("dst"))
            )
            .distinct()
            .localCheckpoint(eager=True)
        )
        # size the loop's exchanges to the LABEL table, not the corpus
        # (the role AQE plays for one-shot queries; AQE is off here to
        # keep the per-round job count constant). ~500k edges/partition.
        n_edges = sym.count()
        parts = int(
            min(
                max(1, n_edges // 500_000),
                spark.sparkContext.defaultParallelism,
            )
        )
        conf.set("spark.sql.shuffle.partitions", str(parts))
        sym = sym.repartition(parts, "dst").localCheckpoint(eager=True)
        labels = (
            sym.select(F.col("src").alias("url"))
            .distinct()
            .withColumn("cluster_id", F.col("url"))
            .localCheckpoint(eager=True)
        )

        for it in range(cfg.cc_max_iterations):
            # two propagation hops per round, one lineage
            stepped = _propagate(sym, _propagate(sym, labels))
            # pointer jumping: follow label -> label-of-label, collapsing
            # chain-mode paths in O(log n) rounds total
            lut = labels.select(
                F.col("url").alias("mid_id"), F.col("cluster_id").alias("jump_id")
            )
            updated = (
                stepped.withColumnRenamed("cluster_id", "mid_id")
                .join(lut, "mid_id", "left")
                .select(
                    "url",
                    F.least(
                        F.col("mid_id"), F.coalesce("jump_id", "mid_id")
                    ).alias("new_id"),
                )
            )
            # ONE materialization + ONE count per round: join the previous
            # labels back in for the convergence test on checkpointed blocks
            ck = (
                updated.join(
                    labels.withColumnRenamed("cluster_id", "old_id"), "url"
                )
                .localCheckpoint(eager=True)
            )
            labels = ck.select("url", F.col("new_id").alias("cluster_id"))
            if it == 0:
                continue  # a graph with any edge changes labels in round 1
            changed = ck.filter(F.col("new_id") != F.col("old_id")).count()
            if changed == 0:
                break
        return labels
    finally:
        conf.set("spark.sql.adaptive.enabled", aqe_before)
        conf.set("spark.sql.shuffle.partitions", shuf_before)
