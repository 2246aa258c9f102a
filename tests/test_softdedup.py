"""E39 SoftDeDup down-weighting: cluster members split one unit of
expected mass, singletons keep weight 1, and expected total mass equals
the number of distinct contents (the property the method exists for)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mediaduplicatefinder_spark.config import DEFAULT_CONFIG
from mediaduplicatefinder_spark.pipeline import run_dedup


def _weights(spark, pages):
    res = run_dedup(spark, pages, DEFAULT_CONFIG, use_html=False)
    clusters = res.clusters.select("url", "cluster_id")
    sizes = clusters.groupBy("cluster_id").agg(
        F.count("*").alias("n_members")
    )
    cw = clusters.join(sizes, "cluster_id")
    return pages.select("url").join(cw, "url", "left").select(
        "url",
        F.coalesce("cluster_id", F.col("url")).alias("cluster_id"),
        F.coalesce("n_members", F.lit(1)).cast("long").alias("n_members"),
        (F.lit(1.0) / F.coalesce("n_members", F.lit(1)).cast("double")).alias(
            "weight"
        ),
    )


def test_softdedup_mass_conservation(spark, tiny_pages_df):
    rows = _weights(spark, tiny_pages_df).collect()
    assert len(rows) == tiny_pages_df.count()  # every page weighted
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, rs in by_cluster.items():
        # each cluster contributes exactly one unit of expected mass
        assert abs(sum(r["weight"] for r in rs) - 1.0) < 1e-9
        n = len(rs)
        assert all(r["n_members"] == n for r in rs)
    # clusters exist in the tiny corpus (the test is non-trivial)
    assert any(len(rs) > 1 for rs in by_cluster.values())
    # singletons keep full weight
    singles = [rs[0] for rs in by_cluster.values() if len(rs) == 1]
    assert singles and all(r["weight"] == 1.0 for r in singles)
