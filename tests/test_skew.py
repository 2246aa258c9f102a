"""E144 skew profile: exact counts/shares/salts vs a python reference
on a planted-skew corpus, tie order, the ok/salt action boundary,
partition invariance, and the DuckDB twin."""

from __future__ import annotations

import pytest

from mediaduplicatefinder_spark.operators.skew import (
    PPM,
    skew_profile,
    skew_profile_sql,
)


@pytest.fixture(scope="module")
def keyed(spark):
    # planted zipf-ish skew: key "hot" 600 rows, "warm" 250, eight
    # cold keys 150 total; two keys tie at 25 rows (order pinned by key)
    rows = (
        [("hot",)] * 600
        + [("warm",)] * 250
        + [("c1",)] * 25
        + [("c2",)] * 25
        + [(f"k{i}",) for i in range(100)]
    )
    return spark.createDataFrame(rows, "k string")


def test_profile_matches_reference(spark, keyed):
    got = {r["key"]: r for r in skew_profile(keyed, "k", target_rows=100, top_k=4).collect()}
    assert set(got) == {"hot", "warm", "c1", "c2"}
    n = 1000
    assert got["hot"]["cnt"] == 600
    assert got["hot"]["share_ppm"] == 600 * PPM // n
    assert got["hot"]["rk"] == 1 and got["warm"]["rk"] == 2
    # tie at 25 rows -> key ascending
    assert got["c1"]["rk"] == 3 and got["c2"]["rk"] == 4
    assert got["hot"]["salt"] == 6 and got["hot"]["action"] == "salt:6"
    assert got["warm"]["salt"] == 3
    assert got["c1"]["salt"] == 1 and got["c1"]["action"] == "ok"


def test_salt_bounds_partitions(spark, keyed):
    """The advertised property: cnt / salt <= target for every key."""
    for target in (64, 100, 333):
        for r in skew_profile(keyed, "k", target_rows=target, top_k=12).collect():
            assert r["cnt"] <= r["salt"] * target
            assert r["cnt"] > (r["salt"] - 1) * target  # tight ceiling


def test_partition_invariance(spark, keyed):
    a = skew_profile(keyed, "k", target_rows=100, top_k=5).collect()
    b = skew_profile(keyed.repartition(7), "k", target_rows=100, top_k=5).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_sql_twin_parity(spark, keyed, tmp_path):
    import duckdb

    df = keyed.withColumnRenamed("k", "user_id")
    p = str(tmp_path / "events.parquet")
    df.write.mode("overwrite").parquet(p)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM parquet_scan('{p}/*.parquet')"
    )
    want = sorted(
        map(
            tuple,
            con.execute(
                skew_profile_sql("user_id", target_rows=100, top_k=6)
            ).fetchall(),
        )
    )
    got = sorted(
        map(
            tuple,
            skew_profile(df, "user_id", target_rows=100, top_k=6).collect(),
        )
    )
    assert got == want
