"""E89 robust length outliers (operators/robuststats.py)."""

from __future__ import annotations

from mediaduplicatefinder_spark.operators.robuststats import (
    robust_length_outliers,
)


def _run(spark, rows, k=4):
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")
    return {
        r.doc_id: r
        for r in robust_length_outliers(df, k=k).collect()
    }


def test_hand_case(spark):
    # group g: values 10,12,14,16,1000 -> lower median = 14? ranks:
    # (10,12,14,16,1000), n=5, rank (5+1)//2 = 3 -> med 14
    # devs: 4,2,0,2,986 sorted (0,2,2,4,986) -> mad at rank 3 = 2
    # outlier iff dev > 8 -> only the 1000
    rows = [(i, "g", v) for i, v in enumerate([10, 12, 14, 16, 1000])]
    got = _run(spark, rows)
    assert got[0].med == 14 and got[0].mad == 2
    flags = {i: got[i].is_outlier for i in range(5)}
    assert flags == {0: False, 1: False, 2: False, 3: False, 4: True}


def test_even_count_lower_median(spark):
    # n=4 -> rank (4+1)//2 = 2 -> LOWER median
    rows = [(i, "g", v) for i, v in enumerate([10, 20, 30, 40])]
    got = _run(spark, rows)
    assert got[0].med == 20


def test_constant_group_zero_mad(spark):
    rows = [(i, "g", 50) for i in range(6)] + [(99, "g", 51)]
    got = _run(spark, rows)
    # med 50, mad 0 -> ANY deviation flags (dev > 0)
    assert got[99].mad == 0 and got[99].is_outlier
    assert not got[0].is_outlier


def test_groups_independent(spark):
    rows = [
        (1, "a", 10),
        (2, "a", 12),
        (3, "a", 14),
        (4, "b", 10000),
        (5, "b", 10002),
        (6, "b", 10004),
    ]
    got = _run(spark, rows)
    # per-group med/mad: a -> (12, 2), b -> (10002, 2); no devs exceed
    # 4*mad even though the groups' scales differ by 1000x
    assert not any(got[i].is_outlier for i in range(1, 7))
    assert got[4].med == 10002 and got[1].med == 12
    assert got[1].mad == 2 and got[4].mad == 2
