"""E138 rendezvous sharding (functions/rendezvous.py)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from mediaduplicatefinder_spark.functions.rendezvous import (
    assign_shards,
    rendezvous_shard,
    rendezvous_sql,
)

S8 = [f"s{i}" for i in range(8)]
S9 = S8 + ["s8"]


def _docs(spark, n=400):
    return spark.range(n).withColumnRenamed("id", "doc_id")


def test_minimal_disruption_exact_property(spark):
    """Growing the shard set moves EXACTLY the docs the new shard wins
    — every other assignment is unchanged (the whole point vs mod-n)."""
    df = _docs(spark).select(
        "doc_id",
        rendezvous_shard(F.col("doc_id").cast("string"), S8).alias("a8"),
        rendezvous_shard(F.col("doc_id").cast("string"), S9).alias("a9"),
    )
    rows = df.collect()
    for r in rows:
        assert (r.a9 == r.a8) or (r.a9 == "s8")
    moved = sum(1 for r in rows if r.a9 == "s8")
    # expectation 1/9 of 400 ~ 44; allow generous band
    assert 15 <= moved <= 85


def test_mod_hash_would_reshuffle(spark):
    """Contrast fixture: modulo sharding moves ~8/9 of docs on the same
    grow — documents WHY rendezvous is the operator."""
    df = _docs(spark).select(
        "doc_id",
        (F.xxhash64("doc_id") % 8).alias("m8"),
        (F.xxhash64("doc_id") % 9).alias("m9"),
    )
    moved = df.filter("m8 <> m9").count()
    assert moved > 300  # vs ~44 for rendezvous


def test_balance(spark):
    counts = (
        assign_shards(_docs(spark, 800), S8)
        .groupBy("shard").count().collect()
    )
    assert len(counts) == 8
    assert all(50 <= r["count"] <= 150 for r in counts)


def test_deterministic_and_partition_invariant(spark):
    a = assign_shards(_docs(spark).repartition(1), S8).collect()
    b = assign_shards(_docs(spark).repartition(13), S8).collect()
    assert {(r.doc_id, r.shard) for r in a} == {
        (r.doc_id, r.shard) for r in b
    }


def test_sql_twin_parity(spark):
    got = {
        (r.doc_id, r.shard)
        for r in assign_shards(_docs(spark, 200), S8).collect()
    }
    con = duckdb.connect()
    want = {
        tuple(r)
        for r in con.sql(
            rendezvous_sql(S8, source="SELECT unnest(range(200)) AS doc_id")
        ).fetchall()
    }
    assert got == want


def test_empty_shards_rejected(spark):
    with pytest.raises(ValueError):
        rendezvous_shard(F.lit("x"), [])
