"""Mutual-kNN graph clustering (operators/mutualknn.py): reciprocity
gate, hub rejection, outlier drop, pluggable knn relation."""

from __future__ import annotations

from pyspark.sql import functions as F

from mediaduplicatefinder_spark.operators.mutualknn import (
    mutual_knn_clusters,
    mutual_knn_edges,
)


def _emb_df(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<double>",
    )


def test_two_blobs_hub_outlier(spark):
    # blob A (ids 0-3) hugs e1, blob B (ids 10-13) hugs e2; 20 is a hub
    # between them, 30 an outlier near -e1
    rows = (
        [(i, [1.0, 0.01 * i, 0.0]) for i in range(4)]
        + [(10 + i, [0.01 * i, 1.0, 0.0]) for i in range(4)]
        + [(20, [0.7, 0.7, 0.05]), (30, [-1.0, 0.0, 0.9])]
    )
    out = mutual_knn_clusters(_emb_df(spark, rows), k=3).collect()
    lab = {r["vec_id"]: r["cluster_id"] for r in out}
    # two 4-member clusters, min-id labels
    assert {lab[i] for i in range(4)} == {0}
    assert {lab[10 + i] for i in range(4)} == {10}
    # hub and outlier fail reciprocity: no row at all
    assert 20 not in lab and 30 not in lab
    sizes = {r["vec_id"]: r["n_members"] for r in out}
    assert sizes[0] == 4 and sizes[11] == 4


def test_mutual_edges_require_both_directions(spark):
    knn = spark.createDataFrame(
        [(1, 2, 0.9), (2, 1, 0.9), (1, 3, 0.8)],  # 1->3 unreciprocated
        "query_id long, vec_id long, cosine double",
    )
    got = mutual_knn_edges(knn).collect()
    assert [(r["vec_a"], r["vec_b"], r["cosine"]) for r in got] == [
        (1, 2, 0.9)
    ]


def test_pluggable_knn_relation(spark):
    # an approximate knn (missing one direction) splits the would-be
    # cluster: the channel is rank-relation-driven, not distance-driven
    rows = [(i, [1.0, 0.001 * i]) for i in range(3)]
    emb = _emb_df(spark, rows)
    knn = spark.createDataFrame(
        [(0, 1, 0.99), (1, 0, 0.99), (2, 0, 0.98)],  # 0's list lacks 2
        "query_id long, vec_id long, cosine double",
    )
    out = mutual_knn_clusters(emb, knn=knn).collect()
    assert {(r["vec_id"], r["cluster_id"]) for r in out} == {(0, 0), (1, 0)}
