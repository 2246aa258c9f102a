"""Mutual k-nearest-neighbor graph clustering over embeddings (E194):
Brito/Chávez/Quiroz/Yukich, "Connectivity of the mutual k-nearest-
neighbor graph in clustering and outlier detection" (Statistics &
Probability Letters 1997); the mutual-kNN connectivity rule behind
scikit-learn's connectivity graphs and the MNN batch-correction /
near-dup grouping pattern.

Why the engine wants a RANK-based embedding channel: every existing
embedding dup channel (`embedding_dup_pairs*`, SemDeDup) cuts on a
GLOBAL cosine threshold — one number for dense template regions and
sparse long-tail regions alike.  The mutual-kNN rule is threshold-free
and locally adaptive: an edge (a, b) exists iff b is in a's top-k AND
a is in b's top-k, so a vector in a dense near-dup blob connects only
within the blob (its top-k is saturated by closer neighbors), while a
hub vector that merely sits NEAR many clusters fails the reciprocity
test from the other side — the published asymmetric-hub remedy.
Connected components over the mutual edges then gives duplicate
groups with no cosine threshold parameter at all (k is a rank, not a
distance — robust to embedding-norm drift between encoder versions).

Scale shape: the kNN relation is pluggable.  The default here is the
exact `cosine_topk` kernel (broadcast queries, one codegen scoring
pass — the declared correctness twin, same role the exact Jaccard
query plays for MinHash); at corpus scale feed NN-Descent's k-NN
graph (E179, `operators/nndescent.py`) or IVF top-k (E33) into
:func:`mutual_knn_edges` — the reciprocity join and the CC pass are
O(edges) either way (<= n*k rows, k constant).  The mutual join is a
self-equi-join on canonical (vec_a, vec_b) keys; cosine symmetry is
bit-exact (element-wise products commute in IEEE754, the fold order
is the index order on both sides), so the forward copy's score is
kept and the reverse copy only witnesses reciprocity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mediaduplicatefinder_spark.config import DEFAULT_CONFIG
from mediaduplicatefinder_spark.operators.clustering import (
    connected_components,
)
from mediaduplicatefinder_spark.operators.embeddings import cosine_topk

MKNN_K = 5


def mutual_knn_edges(knn: DataFrame) -> DataFrame:
    """knn(query_id, vec_id, cosine, ...) directed top-k relation ->
    undirected mutual edges (vec_a < vec_b, cosine): kept iff BOTH
    directions appear in the relation."""
    fwd = knn.filter(F.col("query_id") < F.col("vec_id")).select(
        F.col("query_id").alias("vec_a"),
        F.col("vec_id").alias("vec_b"),
        "cosine",
    )
    rev = knn.filter(F.col("query_id") > F.col("vec_id")).select(
        F.col("vec_id").alias("vec_a"),
        F.col("query_id").alias("vec_b"),
    )
    return fwd.join(rev, ["vec_a", "vec_b"])


def mutual_knn_clusters(
    emb: DataFrame,
    k: int = MKNN_K,
    knn: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cfg=DEFAULT_CONFIG,
) -> DataFrame:
    """embeddings -> (vec_id, cluster_id, n_members): connected
    components over the mutual-kNN graph; vectors with no mutual edge
    are outliers and emit no row (the CC degree >= 1 contract).
    cluster_id = min member vec_id.  Pass ``knn`` to substitute an
    approximate k-NN relation (NN-Descent / IVF) for the exact
    kernel."""
    if knn is None:
        knn = cosine_topk(emb, emb, k=k, id_col=id_col, vec_col=vec_col)
    edges = mutual_knn_edges(knn).select(
        F.col("vec_a").alias("url_a"), F.col("vec_b").alias("url_b")
    )
    labels = connected_components(edges, cfg)
    sizes = labels.groupBy("cluster_id").agg(
        F.count("*").cast("int").alias("n_members")
    )
    return labels.join(sizes, "cluster_id").select(
        F.col("url").alias("vec_id"),
        F.col("cluster_id"),
        F.col("n_members"),
    )


def mutual_knn_sql(k: int = MKNN_K) -> str:
    """DuckDB twin of :func:`mutual_knn_clusters` over the
    ``embeddings`` view: exact kNN (round-6 cosine, (cosine DESC,
    vec_id) rank), reciprocity join, recursive min-label closure."""
    from mediaduplicatefinder_spark.oracle.lsh_sql import _cosine_sql

    cos = _cosine_sql("qv.v", "cv.v")
    return f"""
WITH RECURSIVE
emb0 AS MATERIALIZED (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
),
mscored AS MATERIALIZED (
  SELECT qv.vec_id AS query_id, cv.vec_id AS vec_id, {cos} AS cosine
  FROM emb0 qv JOIN emb0 cv ON cv.vec_id != qv.vec_id
),
mknn AS MATERIALIZED (
  SELECT query_id, vec_id FROM (
    SELECT query_id, vec_id, row_number() OVER (
      PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rk
    FROM mscored
  ) WHERE rk <= {k}
),
mmut AS MATERIALIZED (
  SELECT f.query_id AS vec_a, f.vec_id AS vec_b
  FROM mknn f
  JOIN mknn r ON r.query_id = f.vec_id AND r.vec_id = f.query_id
  WHERE f.query_id < f.vec_id
),
msym AS (
  SELECT vec_a AS src, vec_b AS dst FROM mmut
  UNION SELECT vec_b, vec_a FROM mmut
),
mwalk AS (
  SELECT src AS node, dst AS reach FROM msym
  UNION
  SELECT w.node, s.dst FROM mwalk w JOIN msym s ON s.src = w.reach
),
mlab AS (
  SELECT node AS vec_id, least(min(reach), node) AS cluster_id
  FROM mwalk GROUP BY node
)
SELECT l.vec_id, l.cluster_id,
       (count(*) OVER (PARTITION BY l.cluster_id))::INT AS n_members
FROM mlab l
"""
