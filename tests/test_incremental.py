"""Incremental ingest (incremental.py): two increments must produce
exactly the clusters a full recompute over the union corpus produces,
and each increment's corpus-side joins must read the bucketed store
without reshuffling it."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mediaduplicatefinder_spark.config import DEFAULT_CONFIG
from mediaduplicatefinder_spark.incremental import (
    ingest_batch,
    init_store,
    store_exists,
)
from mediaduplicatefinder_spark.pipeline import run_dedup


def _label_sets(rows):
    """Frozen co-membership view: {cluster_id: frozenset(urls)}."""
    out = {}
    for r in rows:
        out.setdefault(r.cluster_id, set()).add(r.url)
    return {k: frozenset(v) for k, v in out.items()}


@pytest.fixture(scope="module")
def corpus(tiny_corpus):
    pages, _ = tiny_corpus
    # split by position: roughly half the corpus per increment, dup
    # classes straddling the boundary exercise new<->old candidate joins
    half = len(pages) // 2
    return pages.iloc[:half], pages.iloc[half:]


def test_incremental_matches_full_recompute(spark, corpus, tmp_path):
    a, b = corpus
    db = "incr_test"
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    init_store(spark, db, location=str(tmp_path / "store"))
    assert not store_exists(spark, db)

    r1 = ingest_batch(spark, spark.createDataFrame(a), db)
    assert store_exists(spark, db)
    r2 = ingest_batch(spark, spark.createDataFrame(b), db)
    got = _label_sets(r2.labels.collect())

    full = run_dedup(
        spark, spark.createDataFrame(a).unionByName(spark.createDataFrame(b)),
        DEFAULT_CONFIG,
    )
    want = _label_sets(
        full.similar_clusters.select("url", "cluster_id").collect()
    )
    full.cleanup()
    assert got == want  # identical cluster ids AND memberships

    # exact ledger equals the full run's sha grouping
    shas = {
        (r.sha256, r.n_dups, r.cluster_id)
        for r in spark.table(f"{db}.shas").filter(F.col("n_dups") >= 2).collect()
    }
    full_sha = spark.createDataFrame(a).unionByName(spark.createDataFrame(b))
    from mediaduplicatefinder_spark.operators.extract import extracted_or_given_text

    docs = extracted_or_given_text(full_sha, use_html=True)
    want_sha = {
        (r.sha256, r.n_dups, r.cluster_id)
        for r in docs.select(
            F.sha2(F.col("text").cast("binary"), 256).alias("sha256"), "url"
        )
        .groupBy("sha256")
        .agg(F.count("*").alias("n_dups"), F.min("url").alias("cluster_id"))
        .filter(F.col("n_dups") >= 2)
        .collect()
    }
    assert shas == want_sha

    # second increment found cross-increment edges (dup classes straddle)
    old_urls = set(a.url)
    crossing = [
        r
        for r in r2.new_edges.collect()
        if (r.url_a in old_urls) != (r.url_b in old_urls)
    ]
    assert crossing, "expected new<->old similar pairs across the split"
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")


def test_store_side_scan_not_reshuffled(spark, corpus, tmp_path):
    """The band-store side of the new-vs-old candidate join must come
    from the bucketed scan (SelectedBucketsCount in the plan), not an
    Exchange over the corpus."""
    from tests.test_plans import plan_of

    a, b = corpus
    db = "incr_plan_test"
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
    init_store(spark, db, location=str(tmp_path / "store2"))
    ingest_batch(spark, spark.createDataFrame(a), db)

    bands_old = spark.table(f"{db}.bands")
    new_bands = bands_old.limit(50).select("lang", "band", "bh",
        F.col("doc_key").alias("key_new"))
    p = plan_of(new_bands.join(bands_old, ["lang", "band", "bh"]))
    assert "Bucketed: true" in p or "SelectedBucketsCount" in p
    spark.sql(f"DROP DATABASE IF EXISTS {db} CASCADE")
