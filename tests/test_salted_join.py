"""E152 salted join: exact equivalence to the plain join on planted
skew, salt actually spreading the hot key, the salt surviving into the
physical join keys, and partition invariance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mediaduplicatefinder_spark.operators.skew import salted_join

N_SALT = 8


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [("hot", i) for i in range(500)]
        + [(f"cold{i % 20}", i) for i in range(200)],
        "k string, payload long",
    )
    right = spark.createDataFrame(
        [("hot", "H")] + [(f"cold{i}", f"C{i}") for i in range(20)],
        "k string, dim string",
    )
    return left, right


def test_equals_plain_join(spark, sides):
    left, right = sides
    got = sorted(
        map(tuple, salted_join(left, right, "k", N_SALT).collect())
    )
    want = sorted(map(tuple, left.join(right, "k", "inner").collect()))
    assert got == want
    assert len(got) == 700


def test_salt_spreads_hot_key(spark, sides):
    """The hot key's 500 rows must use every salt value — the whole
    point; deterministic because the salt is a hash of the payload."""
    left, _ = sides
    salts = (
        left.filter("k = 'hot'")
        .select(
            F.pmod(F.xxhash64(F.col("payload")), F.lit(N_SALT)).alias("s")
        )
        .distinct()
        .count()
    )
    assert salts == N_SALT


def test_salt_in_physical_join_keys(spark, sides):
    left, right = sides
    plan = salted_join(left, right, "k", N_SALT)._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan


def test_partition_invariance(spark, sides):
    left, right = sides
    a = salted_join(left, right, "k", N_SALT).collect()
    b = salted_join(left.repartition(9), right.repartition(2), "k", N_SALT).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_no_phantom_or_lost_rows_on_unmatched(spark, sides):
    """Left rows with no dimension match drop (inner); dimension rows
    with no left match add nothing — replication must not leak."""
    left, right = sides
    extra_left = left.union(
        left.sparkSession.createDataFrame([("ghost", 1)], left.schema)
    )
    extra_right = right.union(
        right.sparkSession.createDataFrame([("unused", "U")], right.schema)
    )
    got = salted_join(extra_left, extra_right, "k", N_SALT)
    assert got.count() == 700
    assert got.filter("k = 'ghost' OR dim = 'U'").count() == 0
