"""E143 mergeable quantile sketch: grid properties, bin math vs a
python reference, the upper-bound-within-one-bin guarantee against
exact quantiles, mergeability == whole-corpus build, and the DuckDB
twin."""

from __future__ import annotations

import bisect
import math

import pytest
from pyspark.sql import functions as F

from mediaduplicatefinder_spark.operators.quantiles import (
    boundaries,
    bin_expr,
    merge_sketches,
    quantile_estimates,
    quantile_sketch,
    quantile_sketch_sql,
)


def _ref_bin(v: int, bs: list[int]) -> int:
    return bisect.bisect_right(bs, v) - 1


def test_grid_is_strictly_increasing_and_log_spaced():
    bs = boundaries()
    assert bs[0] == 0 and bs[1] == 1
    assert all(a < b for a, b in zip(bs, bs[1:]))
    # past the small-integer octaves the ratio between consecutive
    # boundaries is bounded by one sub-bin step (sqrt(2) at 2/octave)
    for a, b in zip(bs, bs[1:]):
        if a >= 64:
            assert b / a <= math.sqrt(2) * 1.01


def test_bin_expr_matches_reference(spark):
    bs = boundaries()
    vals = [0, 1, 2, 3, 5, 17, 63, 64, 65, 1000, 12345, 10**9, -7, 2**41]
    df = spark.createDataFrame([(v,) for v in vals], "v long").select(
        "v", bin_expr(F.col("v"), bs).alias("bin")
    )
    for r in df.collect():
        # negatives clamp to bin 0 (the [0,1) bin)
        assert r["bin"] == max(_ref_bin(r["v"], bs), 0)


def test_estimates_are_upper_bounds_within_one_bin(spark):
    bs = boundaries()
    rng_vals = [(("a" if i % 3 else "b"), (i * i * 7) % 50000 + 1) for i in range(3000)]
    df = spark.createDataFrame(rng_vals, "grp string, v long")
    sk = quantile_sketch(df, "v", ["grp"])
    est = quantile_estimates(sk, ["grp"], [0.5, 0.9, 0.99])
    by = {(r["grp"], r["q_mille"]): r["est"] for r in est.collect()}
    for grp in ("a", "b"):
        xs = sorted(v for g, v in rng_vals if g == grp)
        for q in (0.5, 0.9, 0.99):
            exact = xs[math.ceil(q * len(xs)) - 1]
            got = by[(grp, int(q * 1000))]
            assert got >= exact  # upper bound
            # within one bin: the boundary below the estimate is <= exact
            i = bs.index(got) if got in bs else len(bs) - 1
            assert bs[max(i - 1, 0)] <= exact


def test_merge_equals_whole_build(spark):
    rows = [(("x" if i % 2 else "y"), (i * 13) % 9999) for i in range(2000)]
    df = spark.createDataFrame(rows, "grp string, v long")
    half1, half2 = df.filter("v % 2 = 0"), df.filter("v % 2 = 1")
    merged = merge_sketches(
        quantile_sketch(half1, "v", ["grp"]),
        quantile_sketch(half2, "v", ["grp"]),
        ["grp"],
    )
    whole = quantile_sketch(df, "v", ["grp"])
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_partition_invariance(spark):
    rows = [("g", (i * 31) % 4096) for i in range(1500)]
    df = spark.createDataFrame(rows, "grp string, v long")
    a = quantile_estimates(
        quantile_sketch(df, "v", ["grp"]), ["grp"], [0.5, 0.9]
    ).collect()
    b = quantile_estimates(
        quantile_sketch(df.repartition(9), "v", ["grp"]), ["grp"], [0.5, 0.9]
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_sql_twin_parity(spark, tmp_path):
    import duckdb

    rows = [
        (i, "t" * 3, ["en", "de", "fr"][i % 3], "web", (i * i) % 30000 + 1)
        for i in range(900)
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    p = str(tmp_path / "docs.parquet")
    df.write.mode("overwrite").parquet(p)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM parquet_scan('{p}/*.parquet')"
    )
    want = sorted(
        map(
            tuple,
            con.execute(quantile_sketch_sql([0.5, 0.9, 0.99])).fetchall(),
        )
    )
    got = sorted(
        map(
            tuple,
            quantile_estimates(
                quantile_sketch(df, "n_chars", ["lang"]),
                ["lang"],
                [0.5, 0.9, 0.99],
            ).collect(),
        )
    )
    assert got == want
