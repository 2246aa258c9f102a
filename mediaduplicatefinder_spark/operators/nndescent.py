"""NN-Descent k-NN graph construction (E179): Dong/Moses/Li WWW'11,
"Efficient k-nearest neighbor graph construction for generic
similarity measures" — the graph-ANN family member (the foundation
HNSW-class indexes build on) beside the bucketed families the engine
already ships (hyperplane-LSH E7, IVF E33, IVF-PQ, multi-probe E167).

Why a k-NN GRAPH and not just top-k queries: SemDeDup/D4 pruning,
medoid election, SCAN roles, and cohesion audits all consume the
neighborhood RELATION of the whole corpus; NN-Descent builds it in
O(iterations) joins without any index, converging because "a
neighbor of a neighbor is likely a neighbor" (the paper's principle).

Algorithm (DataFrame form, everything JVM-side — zero Python in the
path):

1. deterministic init: node u's K starting neighbors are
   (u + o_j) mod N for K fixed offsets o_j = splitmix64(seed ^ j)
   mod (N-1) + 1 — a K-regular pseudo-random circulant graph. The
   paper samples uniformly; a hash-derived circulant is the
   deterministic equivalent (north_rule: results must not depend on
   cluster size or visit order), and the offsets are shared literals
   with the SQL twin.
2. each round: candidates = current neighbors ∪ all
   neighbor-of-neighbor pairs over the SYMMETRIZED graph (the paper's
   local join: u meets every v two hops away, in either direction);
   score exact round-6 cosine (the engine's proven sequential-fold
   parity contract, embeddings.cosine_expr); keep top-K per node by
   (cosine DESC, id ASC) via a per-node window.
3. fixed n_iter rounds (the paper stops on convergence; a fixed
   round count keeps the relation oracle-expressible — recall vs
   brute force is pytest-gated instead).

Published-algorithm deltas, documented: the paper's incremental
new/old flags and ρK sampling only avoid RE-scoring already-scored
pairs (a constant-factor cost lever, not a semantics lever); the
DataFrame form rescopes the full local join each round, so its
neighbor sets dominate the paper's sampled variant at equal rounds.

Scale shape: per round one self-join of the 2KN-edge symmetric graph
(shuffle keyed on the shared middle node — bounded fan-out 2K per
node, so the candidate relation is <= 4K²N rows), one pair-dedup,
two hash joins to attach vectors, one window keyed on u (max 4K²
rows per node — no skew possible by construction). Per-round
localCheckpoint truncates lineage (the CC-loop convention). At 10^12
docs you build the graph per IVF/LSH shard (graph ANN is always
sharded at that scale); the operator itself is shard-local.

The DuckDB twin unrolls the same fixed rounds as chained CTEs from
the same offset literals and the same round-6 cosine, so the driver
gate value-checks the ENTIRE trajectory, not just the last hop.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mediaduplicatefinder_spark.functions import hashing
from mediaduplicatefinder_spark.operators.embeddings import cosine_expr

NND_SEED = 0x9E3779B97F4A7C15


def _init_offsets_raw(k: int, seed: int) -> list[int]:
    """K raw 64-bit offset seeds; each engine reduces them to circulant
    offsets in [1, N-1] as ``raw mod (N-1) + 1`` — the raw literals are
    shared with the SQL twin so the twin stays corpus-size-independent."""
    raw = hashing.splitmix64(
        np.uint64(seed) ^ np.arange(1, k + 1, dtype=np.uint64)
    )
    return [int(r) for r in raw]


def _init_offsets(k: int, n: int, seed: int) -> list[int]:
    """K circulant offsets in [1, N-1] (shared with the SQL twin)."""
    return [r % (n - 1) + 1 for r in _init_offsets_raw(k, seed)]


def nndescent_knn(
    emb: DataFrame,
    k: int = 10,
    n_iter: int = 3,
    seed: int = NND_SEED,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """emb(vec_id, embedding) -> (vec_id, nbr_id, rank, cosine): the
    approximate k-NN graph after ``n_iter`` NN-Descent rounds. rank is
    1..k by (cosine DESC, nbr_id ASC)."""
    spark = emb.sparkSession
    from mediaduplicatefinder_spark.operators.suffixarray import (
        _dense_rank_with_handle,
    )

    base = emb.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("vec"))
    ranked, handle = _dense_rank_with_handle(base, F.col("vid"), "r1")
    ei = ranked.select(
        (F.col("r1") - 1).alias("u"), "vid", "vec"
    ).persist()
    n = ei.count()
    if n < 2:
        handle.unpersist()
        ei.unpersist()
        id_type = dict(emb.dtypes)[id_col]
        return spark.createDataFrame(
            [],
            f"{id_col} {id_type}, nbr_id {id_type}, rank int,"
            " cosine double",
        )
    k_eff = min(k, n - 1)
    offsets = spark.createDataFrame(
        [(o,) for o in sorted(set(_init_offsets(k, n, seed)))],
        "o long",
    )

    nodes = ei.select("u")
    nbr = (
        nodes.crossJoin(F.broadcast(offsets))
        .select("u", ((F.col("u") + F.col("o")) % n).alias("v"))
        .distinct()
    )

    ea = ei.select(F.col("u").alias("__ua"), F.col("vec").alias("__va"))
    eb = ei.select(F.col("u").alias("__ub"), F.col("vec").alias("__vb"))

    def topk(cand: DataFrame) -> DataFrame:
        scored = (
            cand.join(ea, cand["u"] == ea["__ua"])
            .join(eb, cand["v"] == eb["__ub"])
            .select(
                "u",
                "v",
                cosine_expr(F.col("__va"), F.col("__vb")).alias("c"),
            )
        )
        w = Window.partitionBy("u").orderBy(F.desc("c"), F.asc("v"))
        return (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k_eff)
            .select("u", "v", "c", "rn")
        )

    knn = topk(nbr).localCheckpoint(eager=True)
    for _ in range(n_iter):
        sym = knn.select("u", "v").unionByName(
            knn.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        a = sym.select(F.col("u").alias("s"), F.col("v").alias("m"))
        b = sym.select(F.col("u").alias("m"), F.col("v").alias("t"))
        cand = (
            a.join(b, "m")
            .select(F.col("s").alias("u"), F.col("t").alias("v"))
            .filter(F.col("u") != F.col("v"))
            .unionByName(knn.select("u", "v"))
            .distinct()
        )
        knn = topk(cand).localCheckpoint(eager=True)

    ia = ei.select(F.col("u").alias("u"), F.col("vid").alias(id_col))
    ib = ei.select(F.col("u").alias("v"), F.col("vid").alias("nbr_id"))
    out = (
        knn.join(ia, "u")
        .join(ib, "v")
        .select(
            id_col,
            "nbr_id",
            F.col("rn").cast("int").alias("rank"),
            F.col("c").alias("cosine"),
        )
    )
    out = out.localCheckpoint(eager=True)
    handle.unpersist()
    ei.unpersist()
    return out


def nndescent_knn_sql(
    k: int = 10,
    n_iter: int = 3,
    seed: int = NND_SEED,
    emb_sql: str = "SELECT vec_id, embedding FROM embeddings",
) -> str:
    """DuckDB twin: the identical trajectory unrolled as chained CTEs
    from the same raw offset literals (reduced mod (N-1)+1 in SQL, so
    the twin needs no corpus-size parameter)."""
    from mediaduplicatefinder_spark.oracle.lsh_sql import _cosine_sql

    off_rows = ", ".join(
        f"({r}::HUGEINT)" for r in _init_offsets_raw(k, seed)
    )
    cos = _cosine_sql("a.v", "b.v")
    k_eff = f"least({k}, (SELECT n_docs FROM nn) - 1)"

    def topk_ctes(tag: str, cand: str) -> str:
        return f"""
sc{tag} AS (
  SELECT c.u, c.v, {cos} AS c
  FROM ({cand}) c
  JOIN ei a ON a.u = c.u
  JOIN ei b ON b.u = c.v
),
knn{tag} AS MATERIALIZED (
  SELECT u, v, c, rn FROM (
    SELECT *, row_number() OVER (PARTITION BY u ORDER BY c DESC, v) AS rn
    FROM sc{tag}
  ) WHERE rn <= {k_eff}
)"""

    parts = [
        f"""
WITH emb0 AS MATERIALIZED (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM ({emb_sql})
),
idx AS MATERIALIZED (
  SELECT vec_id, row_number() OVER (ORDER BY vec_id) - 1 AS u FROM emb0
),
nn AS (SELECT count(*)::BIGINT AS n_docs FROM emb0),
ei AS MATERIALIZED (
  SELECT i.u, e.v FROM emb0 e JOIN idx i USING (vec_id)
),
offr(raw) AS (VALUES {off_rows}),
off AS (
  SELECT DISTINCT
    ((raw % ((SELECT n_docs FROM nn) - 1)) + 1)::BIGINT AS o
  FROM offr
),
nbr0 AS (
  SELECT DISTINCT i.u,
         (i.u + o.o) % (SELECT n_docs FROM nn) AS v
  FROM idx i, off o
)""",
        topk_ctes("0", "SELECT u, v FROM nbr0"),
    ]
    prev = "knn0"
    for it in range(1, n_iter + 1):
        cand = f"""
  SELECT s.u, t.v FROM
    (SELECT u, v FROM {prev} UNION SELECT v, u FROM {prev}) s
  JOIN
    (SELECT u AS m, v FROM {prev} UNION SELECT v AS m, u AS v FROM {prev}) t
    ON s.v = t.m
  WHERE s.u <> t.v
  UNION
  SELECT u, v FROM {prev}"""
        parts.append(topk_ctes(str(it), cand))
        prev = f"knn{it}"
    body = ",".join(parts)
    return f"""{body}
SELECT ia.vec_id, ib.vec_id AS nbr_id, kk.rn::INT AS rank, kk.c AS cosine
FROM {prev} kk
JOIN idx ia ON ia.u = kk.u
JOIN idx ib ON ib.u = kk.v
"""
