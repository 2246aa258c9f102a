"""Cluster-stability churn report (E153): does re-running dedup on a
GROWN corpus keep the old documents' cluster assignments? The north
star demands "stable cluster IDs"; the incremental store (E20) proves
batch-ingest == full-recompute, and this operator measures the other
half — what a full recompute does to existing co-membership when new
documents arrive (new bridge docs can merge old clusters; they can
never split one, which the report makes visible).

Pair-level formulation (label-free, so renumbered cluster ids do not
read as churn): co-membership of two OLD documents is the observable.

- ``pairs_a``: (u, v) co-clustered in run A (the old corpus);
- ``preserved``: still co-clustered in run B (the grown corpus);
- ``broken``: in A but not B — with a deterministic pipeline this is
  REAL signal (a capped bucket spilled, a threshold crossed), and the
  expected value is 0;
- ``merged_new``: co-clustered in B between old documents that A kept
  apart — new bridge documents connecting old clusters (legitimate
  growth, reported not hidden);
- ``preserved_ppm``: preserved / pairs_a in integer ppm.

Scale shape: co-membership pairs come from a self-join on
(kind, cluster_id) — quadratic in CLUSTER size, not corpus size, and
dedup clusters are small by construction (the same Σn_k² bound as
SemDeDup's within-cluster pass); the A∩B restriction is two hash
semi-joins on the old-corpus url relation; the final compare is one
pair-keyed full outer join + a single-row aggregate.

Reference tie-in: none (the reference rescans from scratch and shows
whatever falls out); SURVEY §2 E-series extension — the temporal
QA sibling of the capture-recapture recall audit (E148).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PPM = 1_000_000


def co_membership_pairs(clusters: DataFrame) -> DataFrame:
    """(url_a, url_b) with url_a < url_b: distinct co-clustered pairs
    keyed by (kind, cluster_id)."""
    c = clusters.select("url", "kind", "cluster_id")
    x, y = c.alias("x"), c.alias("y")
    return x.join(
        y,
        (F.col("x.kind") == F.col("y.kind"))
        & (F.col("x.cluster_id") == F.col("y.cluster_id"))
        & (F.col("x.url") < F.col("y.url")),
    ).select(
        F.col("x.url").alias("url_a"), F.col("y.url").alias("url_b")
    ).distinct()


def cluster_stability(
    clusters_a: DataFrame,
    clusters_b: DataFrame,
    known_urls: DataFrame,
) -> DataFrame:
    """One row: (pairs_a, pairs_b_known, preserved, broken, merged_new,
    preserved_ppm). ``known_urls(url)`` is run A's corpus — run B's
    pairs are restricted to old-document endpoints so growth itself
    does not read as churn."""
    pa = co_membership_pairs(clusters_a).withColumn("in_a", F.lit(1))
    ku = known_urls.select(F.col("url")).distinct()
    pb = (
        co_membership_pairs(clusters_b)
        .join(ku.withColumnRenamed("url", "url_a"), "url_a", "left_semi")
        .join(ku.withColumnRenamed("url", "url_b"), "url_b", "left_semi")
        .withColumn("in_b", F.lit(1))
    )
    merged = pa.join(pb, ["url_a", "url_b"], "full_outer").select(
        F.coalesce("in_a", F.lit(0)).alias("in_a"),
        F.coalesce("in_b", F.lit(0)).alias("in_b"),
    )
    agg = merged.agg(
        F.sum("in_a").alias("pairs_a"),
        F.sum("in_b").alias("pairs_b_known"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("preserved"),
        F.sum(F.col("in_a") * (1 - F.col("in_b"))).alias("broken"),
        F.sum((1 - F.col("in_a")) * F.col("in_b")).alias("merged_new"),
    )
    return agg.select(
        "pairs_a",
        "pairs_b_known",
        "preserved",
        "broken",
        "merged_new",
        F.when(
            F.col("pairs_a") > 0,
            F.expr(f"(preserved * {PPM}) div pairs_a"),
        ).alias("preserved_ppm"),
    )


def cluster_stability_sql(
    clusters_a_sql: str,
    clusters_b_sql: str,
    known_urls_sql: str,
) -> str:
    """DuckDB twin: both cluster relations (each a full recursive
    dedup-oracle query, scoped in its own subquery) through the same
    pair algebra."""
    return f"""WITH ca AS MATERIALIZED (
  SELECT url, kind, cluster_id FROM ({clusters_a_sql})
),
cb AS MATERIALIZED (
  SELECT url, kind, cluster_id FROM ({clusters_b_sql})
),
known AS MATERIALIZED (SELECT url FROM ({known_urls_sql})),
pa AS (
  SELECT DISTINCT x.url AS url_a, y.url AS url_b
  FROM ca x JOIN ca y
    ON x.kind = y.kind AND x.cluster_id = y.cluster_id
   AND x.url < y.url
),
pb AS (
  SELECT DISTINCT x.url AS url_a, y.url AS url_b
  FROM cb x JOIN cb y
    ON x.kind = y.kind AND x.cluster_id = y.cluster_id
   AND x.url < y.url
  WHERE x.url IN (SELECT url FROM known)
    AND y.url IN (SELECT url FROM known)
),
m AS (
  SELECT CASE WHEN pa.url_a IS NOT NULL THEN 1 ELSE 0 END AS in_a,
         CASE WHEN pb.url_a IS NOT NULL THEN 1 ELSE 0 END AS in_b
  FROM pa FULL OUTER JOIN pb
    ON pa.url_a = pb.url_a AND pa.url_b = pb.url_b
),
agg AS (
  SELECT CAST(SUM(in_a) AS BIGINT) AS pairs_a,
         CAST(SUM(in_b) AS BIGINT) AS pairs_b_known,
         CAST(SUM(in_a * in_b) AS BIGINT) AS preserved,
         CAST(SUM(in_a * (1 - in_b)) AS BIGINT) AS broken,
         CAST(SUM((1 - in_a) * in_b) AS BIGINT) AS merged_new
  FROM m
)
SELECT pairs_a, pairs_b_known, preserved, broken, merged_new,
       CASE WHEN pairs_a > 0
            THEN (preserved * {PPM}) // pairs_a END AS preserved_ppm
FROM agg"""
