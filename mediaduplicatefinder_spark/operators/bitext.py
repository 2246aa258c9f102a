"""Margin-based bitext mining (E206): Artetxe / Schwenk, "Margin-based
Parallel Corpus Mining with Multilingual Sentence Embeddings" (ACL
2019) — the criterion CCMatrix/WikiMatrix used to mine parallel text
out of Common Crawl at scale.

Why raw cosine is not enough (the paper's finding, directly relevant
to a webtext engine): embedding spaces have hubs — vectors that are
close to EVERYTHING — so a global cosine threshold either floods the
output with hub pairs or starves sparse regions.  The ratio margin
normalizes each candidate by the density of both endpoints'
neighborhoods:

    margin(x, y) = cos(x, y) / ( (Σ_{z∈NNk(x)} cos(x,z)
                               +  Σ_{z∈NNk(y)} cos(y,z)) / 2k )

where NNk runs over the OTHER side (forward + backward — the paper's
"max" strategy scores both directions; scoring the unordered pair once
with both neighborhoods is the symmetric "ratio" variant implemented
here).  A pair only survives if it stands out ABOVE its own
neighborhood density — hub pairs are punished by their large
denominators.

Cross-engine float contract: per-pair cosines are the shared round-6
kernel; each is then scaled to an exact integer c = round(cos·10^6),
the k-NN sums are INTEGER sums (no float-order anywhere), and the
margin is ONE IEEE division of two exact integers:
margin = (c_xy · 2k) / (S_x + S_y).

Shape (exact twin): cross-side pairs ride the triangle-blocked cosine
kernel with no threshold (the k-NN means need the full neighbor
distribution), then two per-side top-k windows (WindowGroupLimit —
O(n·k) rows past the exchange) and one pair join against the two sum
relations.  At corpus scale the pair base is the ANN candidate
channel (hyperplane-LSH / IVF) and the k-NN sums come from the same
shortlists — an under-approximation of the true neighborhood mean
that RAISES margins uniformly; threshold recalibrated, shape
unchanged.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mediaduplicatefinder_spark.operators.allpairs import blocked_cosine_pairs

SCALE = 1_000_000


def margin_pairs(
    emb: DataFrame,
    side: Column,
    k: int = 4,
    floor: float = 0.3,
    margin_threshold: float = 1.2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cand_pairs: DataFrame | None = None,
) -> DataFrame:
    """emb + side expr (0 = source, 1 = target) -> (vec_src, vec_tgt,
    cosine, margin): cross-side pairs with round-6 cosine >= floor and
    ratio margin >= margin_threshold; margin from exact integer k-NN
    sums (both sides must have >= k vectors).

    ``cand_pairs`` (optional): a precomputed pair relation
    ``(vid_a, vid_b, cosine)`` (canonical a < b, round-6 cosine) — the
    corpus-scale plug point: feed the ANN shortlist join instead of
    the unthresholded exact kernel.  The k-NN means then run over the
    shortlist neighborhoods (the paper's own deployment: FAISS
    shortlists), which RAISES margins uniformly — recalibrate the
    threshold, shape unchanged."""
    tagged = emb.select(
        F.col(id_col).alias("vid"), side.alias("side"), F.col(vec_col)
    )
    pairs = cand_pairs
    if pairs is None:
        pairs = blocked_cosine_pairs(
            tagged.select("vid", vec_col),
            id_col="vid",
            vec_col=vec_col,
            threshold=-1.0,
        )
    sides = tagged.select("vid", "side")
    pairs = pairs.join(
        sides.select(
            F.col("vid").alias("vid_a"), F.col("side").alias("side_a")
        ),
        "vid_a",
    ).join(
        sides.select(
            F.col("vid").alias("vid_b"), F.col("side").alias("side_b")
        ),
        "vid_b",
    )
    cross = (
        pairs.filter(F.col("side_a") != F.col("side_b"))
        .select(
            F.when(F.col("side_a") == 0, F.col("vid_a"))
            .otherwise(F.col("vid_b"))
            .alias("vec_src"),
            F.when(F.col("side_a") == 0, F.col("vid_b"))
            .otherwise(F.col("vid_a"))
            .alias("vec_tgt"),
            "cosine",
            F.round(F.col("cosine") * SCALE).cast("long").alias("ci"),
        )
        # localCheckpoint, not persist: the relation is reused three
        # times below (two top-k windows + the final join), but a bare
        # persist() is never unpersisted and the full unthresholded
        # cross-side relation accumulates in executor storage across
        # invocations in a long-lived session.  Eager localCheckpoint
        # materializes it once, truncates lineage, and its blocks are
        # released with the DataFrame instead of pinning the storage
        # pool until eviction.
        .localCheckpoint(eager=True)
    )
    wsrc = Window.partitionBy("vec_src").orderBy(
        F.col("cosine").desc(), F.col("vec_tgt")
    )
    s_src = (
        cross.withColumn("r", F.row_number().over(wsrc))
        .filter(F.col("r") <= k)
        .groupBy("vec_src")
        .agg(F.sum("ci").alias("s_src"))
    )
    wtgt = Window.partitionBy("vec_tgt").orderBy(
        F.col("cosine").desc(), F.col("vec_src")
    )
    s_tgt = (
        cross.withColumn("r", F.row_number().over(wtgt))
        .filter(F.col("r") <= k)
        .groupBy("vec_tgt")
        .agg(F.sum("ci").alias("s_tgt"))
    )
    return (
        cross.join(s_src, "vec_src")
        .join(s_tgt, "vec_tgt")
        .filter(F.col("s_src") + F.col("s_tgt") > 0)
        .select(
            "vec_src",
            "vec_tgt",
            "cosine",
            (
                (F.col("ci") * F.lit(2 * k)).cast("double")
                / (F.col("s_src") + F.col("s_tgt"))
            ).alias("margin"),
        )
        .filter(
            (F.col("cosine") >= floor)
            & (F.col("margin") >= margin_threshold)
        )
    )


def margin_pairs_sql(
    k: int = 4,
    floor: float = 0.3,
    margin_threshold: float = 1.2,
    emb_sql: str = (
        "SELECT vec_id, vec_id % 2 AS side,"
        " embedding::DOUBLE[] AS v FROM embeddings"
    ),
    pairs_sql: str | None = None,
) -> str:
    """DuckDB twin: identical round-6 cosines, integer scaling, top-k
    windows, and the single margin division.

    ``pairs_sql`` (optional): a SELECT yielding canonical pairs
    ``(vid_a, vid_b, cosine)`` — the twin of the operator's
    ``cand_pairs`` plug point; sides are joined from ``bt_ev`` and
    same-side pairs dropped, mirroring the operator.  Default is the
    exact unthresholded cross join."""
    from mediaduplicatefinder_spark.oracle.lsh_sql import _cosine_sql

    if pairs_sql is None:
        cp = f"""
  SELECT a.vec_id AS vec_src, b.vec_id AS vec_tgt,
         {_cosine_sql('a.v', 'b.v')} AS cosine
  FROM bt_ev a JOIN bt_ev b ON a.side = 0 AND b.side = 1"""
    else:
        cp = f"""
  SELECT CASE WHEN sa.side = 0 THEN p.vid_a ELSE p.vid_b END AS vec_src,
         CASE WHEN sa.side = 0 THEN p.vid_b ELSE p.vid_a END AS vec_tgt,
         p.cosine
  FROM ({pairs_sql}) p
  JOIN bt_ev sa ON sa.vec_id = p.vid_a
  JOIN bt_ev sb ON sb.vec_id = p.vid_b
  WHERE sa.side <> sb.side"""
    return f"""
WITH bt_ev AS ({emb_sql}),
bt_cp AS MATERIALIZED ({cp}
),
bt_ci AS MATERIALIZED (
  SELECT vec_src, vec_tgt, cosine,
         CAST(round(cosine * {SCALE}) AS BIGINT) AS ci
  FROM bt_cp
),
bt_sa AS (
  SELECT vec_src, sum(ci)::BIGINT AS s_src FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_src
               ORDER BY cosine DESC, vec_tgt) AS r FROM bt_ci)
  WHERE r <= {k} GROUP BY vec_src
),
bt_sb AS (
  SELECT vec_tgt, sum(ci)::BIGINT AS s_tgt FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_tgt
               ORDER BY cosine DESC, vec_src) AS r FROM bt_ci)
  WHERE r <= {k} GROUP BY vec_tgt
)
SELECT c.vec_src, c.vec_tgt, c.cosine,
       (c.ci * {2 * k})::DOUBLE / (a.s_src + b.s_tgt) AS margin
FROM bt_ci c
JOIN bt_sa a USING (vec_src)
JOIN bt_sb b USING (vec_tgt)
WHERE a.s_src + b.s_tgt > 0
  AND c.cosine >= {floor}
  AND (c.ci * {2 * k})::DOUBLE / (a.s_src + b.s_tgt)
        >= {margin_threshold}
"""
