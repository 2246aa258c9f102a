"""Content-keyed signature reuse (pipeline.run_dedup sigs_all param):
injecting precomputed page_signatures rows must produce the identical
DedupResult — the snapshot-churn job's compute-once-filter-per-subset
shape (E153 uses it to halve the two-corpus signature cost)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mediaduplicatefinder_spark.config import DEFAULT_CONFIG
from mediaduplicatefinder_spark.operators.signatures import page_signatures
from mediaduplicatefinder_spark.pipeline import run_dedup


def _snap(res):
    clusters = sorted(
        (r.url, r.cluster_id, r.kind, round(r.score, 9))
        for r in res.clusters.collect()
    )
    pairs = sorted(
        (r.url_a, r.url_b, round(r.jaccard, 9))
        for r in res.pairs.filter("similar").collect()
    )
    res.pairs.unpersist()
    return clusters, pairs


def test_injected_signatures_identical_result(spark, tiny_pages_df):
    base = _snap(run_dedup(spark, tiny_pages_df, DEFAULT_CONFIG))
    sigs = page_signatures(tiny_pages_df, DEFAULT_CONFIG, use_html=True)
    inj = _snap(
        run_dedup(spark, tiny_pages_df, DEFAULT_CONFIG, sigs_all=sigs)
    )
    assert inj == base


def test_filtered_injection_equals_subset_run(spark, tiny_pages_df):
    """The churn shape itself: full-corpus signatures filtered to a
    subset must equal running the pipeline on the subset directly."""
    subset_cond = F.pmod(F.xxhash64("url"), F.lit(10)) != 9
    pages_sub = tiny_pages_df.filter(subset_cond)
    base = _snap(run_dedup(spark, pages_sub, DEFAULT_CONFIG))
    sigs_full = page_signatures(tiny_pages_df, DEFAULT_CONFIG, use_html=True)
    inj = _snap(
        run_dedup(
            spark,
            pages_sub,
            DEFAULT_CONFIG,
            sigs_all=sigs_full.filter(subset_cond),
        )
    )
    assert inj == base
