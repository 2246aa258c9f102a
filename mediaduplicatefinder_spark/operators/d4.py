"""D4 document de-duplication + diversification (E169, Tirumala et
al. 2023, arXiv:2308.12284): SemDeDup first (drop embedding near-
duplicates inside semantic clusters), then SSL-prototype pruning —
within each cluster drop the ``proto_pct`` percent of the SURVIVORS
that sit closest to the cluster centroid.  The paper's finding is that
after dedup the remaining redundancy lives in the most prototypical
(centroid-hugging) examples; removing them diversifies the corpus.

This completes the engine's data-selection family: DSIR (E32) weights
by target-domain importance, SemDeDup (E31) removes semantic
duplicates, D4 composes dedup with diversity pruning.

Relation to the reference: the keeper rule (duplicate_gui.py keeper
priority) keeps ONE member per duplicate group; D4 generalizes that
decision to "keep the informative fraction of every semantic
neighborhood" — same decision shape (deterministic member ranking
inside a group, integer cutoff), lifted from exact groups to embedding
clusters.

Scale shape (nothing here exceeds the pieces already audited):

1. SemDeDup stage — see operators/semdedup.py (broadcast centroid
   assignment, Sum_k n_k^2 blocked pairs, key-partitioned loser joins).
2. Prototype rank — the E26 two-phase exact rank, NOT a per-cluster
   global window (a web corpus is skewed: one boilerplate cluster can
   hold half the corpus, and a `Window.partitionBy(cluster)` would
   funnel it through one reducer task):
   a. per-cluster survivor counts + approx-quantile cut points of
      cos_centroid — one map-side-combining agg, tiny result,
      broadcast;
   b. bucket each survivor by counting cuts strictly above its
      cos_centroid (ties always share a bucket, so bucket order is a
      coarsening of the total order (cos DESC, vec_id ASC));
   c. per-(cluster,bucket) counts -> exclusive offsets (window over a
      B-rows-per-cluster aggregate, driver-scale);
   d. one hash exchange on (cluster,bucket): within-bucket row_number
      + broadcast offset = the exact global per-cluster rank, B-way
      parallel per cluster.
3. Cutoff — integer arithmetic ``(n_keep * proto_pct) div 100`` so
   both engines agree exactly; drop rank <= cutoff (the most
   prototypical survivors).

The DuckDB twin (``d4_selection_sql``) chains the semdedup CTEs and
ranks with a NAIVE per-cluster ROW_NUMBER window — agreement proves
the two-phase decomposition exact, the same proof obligation as E26.
Cosines are the engine's sequential-fold doubles (bit-identical to
DuckDB's list_dot_product evaluation order), so ranking on the raw
double is cross-engine stable; ties break on vec_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .semdedup import DEFAULT_TAU, K_CENTROIDS, semdedup, semdedup_ctes

DEFAULT_PROTO_PCT = 30
DEFAULT_RANK_BUCKETS = 8


def d4_selection(
    emb: DataFrame,
    dim: int,
    tau: float = DEFAULT_TAU,
    proto_pct: int = DEFAULT_PROTO_PCT,
    k: int = K_CENTROIDS,
    n_blocks: int = 4,
    n_buckets: int = DEFAULT_RANK_BUCKETS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(vec_id, cluster, cos_centroid, semdedup_keep, proto_rank,
    selected): ``semdedup_keep`` is the E31 verdict; ``proto_rank`` is
    the exact 1-based rank of each SURVIVOR within its cluster by
    (cos_centroid DESC, vec_id ASC) — rank 1 = most prototypical —
    NULL for semdedup losers; ``selected`` keeps survivors with
    proto_rank > (n_survivors * proto_pct) div 100."""
    if n_buckets < 2:
        # n_buckets=1 would hand percentile_approx an empty prob array
        # — a confusing plan-time AnalysisException for a legal-looking
        # knob (review r5; the hits_fixed iters>=1 convention)
        raise ValueError("d4_selection requires n_buckets >= 2")
    sem = semdedup(
        emb, dim, tau=tau, k=k, n_blocks=n_blocks,
        id_col=id_col, vec_col=vec_col,
    )
    kept = sem.filter("keep").select(id_col, "cluster", "cos_centroid")

    # (a) survivor counts + rank-bucket cut points: tiny agg, broadcast
    probs = [i / n_buckets for i in range(1, n_buckets)]
    cl_info = kept.groupBy("cluster").agg(
        F.count("*").alias("n_keep"),
        F.percentile_approx("cos_centroid", probs).alias("cuts"),
    ).withColumn(
        "n_drop", F.expr(f"(n_keep * {int(proto_pct)}) div 100")
    )

    # (b) bucket 0 = most prototypical; equal cosines share a bucket
    bucketed = kept.join(F.broadcast(cl_info), "cluster").withColumn(
        "bucket",
        F.size(F.filter("cuts", lambda c: c > F.col("cos_centroid"))),
    )

    # (c) exclusive per-bucket offsets over the tiny counts table
    wb = (
        Window.partitionBy("cluster")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        bucketed.groupBy("cluster", "bucket")
        .agg(F.count("*").alias("bcnt"))
        .withColumn("offset", F.coalesce(F.sum("bcnt").over(wb), F.lit(0)))
        .select("cluster", "bucket", "offset")
    )

    # (d) one exchange on (cluster,bucket): exact global rank
    ww = Window.partitionBy("cluster", "bucket").orderBy(
        F.desc("cos_centroid"), F.asc(id_col)
    )
    ranked = (
        bucketed.join(F.broadcast(offsets), ["cluster", "bucket"])
        .withColumn(
            "proto_rank",
            (F.col("offset") + F.row_number().over(ww)).cast("long"),
        )
        .select(id_col, "proto_rank", "n_drop")
    )

    return sem.join(ranked, id_col, "left").select(
        id_col,
        "cluster",
        "cos_centroid",
        F.col("keep").alias("semdedup_keep"),
        "proto_rank",
        F.coalesce(
            F.col("proto_rank") > F.col("n_drop"), F.lit(False)
        ).alias("selected"),
    )


def d4_selection_sql(
    dim: int = 64,
    tau: float = DEFAULT_TAU,
    proto_pct: int = DEFAULT_PROTO_PCT,
    k: int = K_CENTROIDS,
) -> str:
    """DuckDB twin: semdedup CTE chain + a naive per-cluster
    ROW_NUMBER window + the same integer cutoff."""
    return (
        "WITH "
        + semdedup_ctes(dim, tau, k)
        + f""",
d4_kept AS (
  SELECT vec_id, cluster, cos_centroid FROM sem WHERE keep
),
d4_nd AS (
  SELECT cluster, (count(*) * {int(proto_pct)}) // 100 AS n_drop
  FROM d4_kept GROUP BY cluster
),
d4_rk AS (
  SELECT vec_id, cluster,
         ROW_NUMBER() OVER (PARTITION BY cluster
                            ORDER BY cos_centroid DESC, vec_id ASC)
           ::BIGINT AS proto_rank
  FROM d4_kept
)
SELECT s.vec_id, s.cluster, s.cos_centroid,
       s.keep AS semdedup_keep, r.proto_rank,
       coalesce(r.proto_rank > n.n_drop, FALSE) AS selected
FROM sem s
LEFT JOIN d4_rk r USING (vec_id)
LEFT JOIN d4_nd n ON s.cluster = n.cluster
"""
    )
