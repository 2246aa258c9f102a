"""E70 leakage-safe split: structural invariants (the bit-level hash
parity is proven by the DuckDB twin in the driver gate)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mediaduplicatefinder_spark.operators.selection import (
    DEFAULT_SPLITS,
    SPLIT_MODULUS,
    leakage_split,
)


def _hosts_df(spark, n_docs=400, n_hosts=23, parts=4):
    return (
        spark.range(n_docs)
        .select(
            F.col("id").alias("doc_id"),
            F.format_string("host://%09d", F.col("id") % n_hosts).alias("host"),
        )
        .repartition(parts)
    )


def test_no_host_straddles_splits(spark):
    out = leakage_split(_hosts_df(spark))
    per_host = out.groupBy("host").agg(
        F.countDistinct("split").alias("k"), F.countDistinct("bucket").alias("b")
    )
    bad = per_host.filter((F.col("k") != 1) | (F.col("b") != 1)).count()
    assert bad == 0


def test_buckets_in_range_and_split_rule(spark):
    rows = leakage_split(_hosts_df(spark)).collect()
    for r in rows:
        assert 0 <= r["bucket"] < SPLIT_MODULUS
        want = (
            "train" if r["bucket"] < 98 else ("valid" if r["bucket"] < 99 else "test")
        )
        assert r["split"] == want


def test_custom_splits_cover_every_boundary(spark):
    """A 50/30/20 split over many hosts must populate all three names,
    and the boundary rule is cumulative-< on the same buckets."""
    splits = (("a", 50), ("b", 30), ("c", 20))
    rows = leakage_split(_hosts_df(spark, n_hosts=211), splits=splits).collect()
    seen = set()
    for r in rows:
        want = "a" if r["bucket"] < 50 else ("b" if r["bucket"] < 80 else "c")
        assert r["split"] == want
        seen.add(r["split"])
    assert seen == {"a", "b", "c"}


def test_weights_must_sum_to_modulus(spark):
    with pytest.raises(ValueError):
        leakage_split(_hosts_df(spark), splits=(("train", 99),))


def test_partition_invariance(spark):
    a = sorted(map(tuple, leakage_split(_hosts_df(spark, parts=1)).collect()))
    b = sorted(map(tuple, leakage_split(_hosts_df(spark, parts=8)).collect()))
    assert a == b
