"""E101 soft-404 detection (operators/soft404.py)."""

from __future__ import annotations

from mediaduplicatefinder_spark.operators.soft404 import soft404_flags

LONG = "word " * 60  # 300 chars of normal page body


def _run(spark, rows):
    df = spark.createDataFrame(rows, "host string, doc_id long, text string")
    return {r.doc_id: r for r in soft404_flags(df).collect()}


def test_two_phrases_flag_regardless_of_size(spark):
    got = _run(
        spark,
        [
            ("h", 1, LONG + "error 404 page not found" + LONG),
            ("h", 2, LONG),
            ("h", 3, LONG),
        ],
    )
    assert got[1].phrase_hits == 2 and got[1].is_soft404
    assert not got[2].is_soft404


def test_one_phrase_needs_size_prior(spark):
    got = _run(
        spark,
        [
            ("h", 1, "sorry page not found"),  # 1 phrase, tiny
            ("h", 2, LONG + "page not found"),  # 1 phrase, >= median/2
            ("h", 3, LONG),
            ("h", 4, LONG),
            ("h", 5, LONG),
        ],
    )
    assert got[1].phrase_hits == 1 and got[1].is_soft404
    assert got[2].phrase_hits == 1 and not got[2].is_soft404


def test_median_is_per_host_lower_median(spark):
    got = _run(
        spark,
        [
            ("a", 1, "x" * 10),
            ("a", 2, "x" * 20),
            ("a", 3, "x" * 30),
            ("a", 4, "x" * 40),  # even n -> lower median = 20
            ("b", 5, "y" * 99),
        ],
    )
    assert got[1].host_med == 20
    assert got[5].host_med == 99


def test_case_insensitive_phrases(spark):
    got = _run(
        spark,
        [("h", 1, "Error 404 Page Not Found"), ("h", 2, LONG), ("h", 3, LONG)],
    )
    assert got[1].phrase_hits == 2 and got[1].is_soft404
