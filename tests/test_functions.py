"""Operator unit tests on hand-computed expecteds (SURVEY.md §5.2 layer 2)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mediaduplicatefinder_spark.functions.text import (
    first_n_lines_expr,
    hamming_expr,
    jaccard_expr,
    size_ratio_expr,
    tokens_expr,
    url_dirname_expr,
    url_stem_expr,
)
from mediaduplicatefinder_spark.oracle import textsim


# ---- first-50-lines truncation (main_cli.cpp:260-270) ----
FNL_CASES = [
    "",
    "a",
    "a\n",
    "\n",
    "a\nb",
    "a\nb\n",
    "a\n\nb\n",
    "\n".join(f"line{i}" for i in range(80)),
    "\n".join(f"line{i}" for i in range(80)) + "\n",
]


@pytest.mark.parametrize("text", FNL_CASES)
def test_first_n_lines_python(text):
    got = textsim.first_n_lines(text, 50)
    lines = got.split("\n")
    assert len(lines) - 1 <= 50
    if text:
        assert got.endswith("\n")


def test_first_n_lines_spark_matches_oracle(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(FNL_CASES)], ["id", "text"])
    rows = df.select("id", first_n_lines_expr("text", 50).alias("t")).collect()
    for r in rows:
        assert r.t == textsim.first_n_lines(FNL_CASES[r.id], 50), repr(FNL_CASES[r.id])


# ---- Jaccard (main_cli.cpp:285-294) ----
def test_jaccard_edges_python():
    assert textsim.text_similarity("", "anything here") == 0.0
    assert textsim.text_similarity("abc def", "") == 0.0
    assert textsim.jaccard(set(), set()) == 0.0
    assert textsim.jaccard({"abc"}, {"abc"}) == 1.0
    assert textsim.jaccard({"abc", "def"}, {"ghi", "jkl"}) == 0.0
    assert textsim.jaccard({"abc", "def", "ghi"}, {"abc", "def", "xyz"}) == 0.5


def test_jaccard_spark(spark):
    df = spark.createDataFrame(
        [
            (["abc", "def", "ghi"], ["abc", "def", "xyz"], 0.5),
            ([], ["abc"], 0.0),
            ([], [], 0.0),
            (["abc"], ["abc"], 1.0),
        ],
        ["a", "b", "expected"],
    )
    for r in df.select(jaccard_expr(F.col("a"), F.col("b")).alias("j"), "expected").collect():
        assert r.j == pytest.approx(r.expected)


# ---- char-bag string similarity (main_cli.cpp:341-357) ----
def test_string_similarity_reference_oddities():
    assert textsim.string_similarity("Same", "same") == 1.0
    assert textsim.string_similarity("abcdef", "cde") == 0.8  # containment
    assert textsim.string_similarity("cde", "abcdef") == 0.8
    # cross-product count: "aaa" vs "aa" -> common = 3*2 = 6, total 5 -> 2.4
    assert textsim.string_similarity("aaa", "aab") == pytest.approx(
        (2.0 * (3 * 2)) / 6
    )  # NOTE: > 1.0, reproduced as-is for parity
    assert textsim.string_similarity("", "") == 1.0  # equal strings
    assert textsim.string_similarity("ab", "ba") == pytest.approx(2 * 2 / 4)


def test_audio_rule():
    assert textsim.audio_similarity("song", "song") == (True, 1.0)
    assert textsim.audio_similarity("song", "song1") == (True, 0.95)
    assert textsim.audio_similarity("song2", "song") == (True, 0.95)


def test_archive_rule():
    ok, score = textsim.archive_similarity(100, 90, "data", "data")
    # equal stems -> containment path gives 1.0; ratio 0.9 -> mean 0.95
    assert ok and score == pytest.approx((0.9 + 1.0) / 2)
    assert textsim.archive_similarity(100, 10, "data", "data") == (False, 0.0)


# ---- size ratio / hamming / url helpers ----
def test_size_ratio(spark):
    df = spark.createDataFrame([(30, 100), (0, 10), (7, 7)], ["a", "b"])
    got = [
        r.r
        for r in df.select(
            size_ratio_expr(F.col("a"), F.col("b")).alias("r")
        ).collect()
    ]
    assert got == [pytest.approx(0.3), 0.0, 1.0]


def test_hamming_spark(spark):
    df = spark.createDataFrame(
        [(0, 0, 0), (-1, 0, 64), (0b1011, 0b0001, 2), (1 << 62, 0, 1)],
        ["a", "b", "expected"],
    )
    for r in df.select(
        hamming_expr(F.col("a"), F.col("b")).alias("d"), "expected"
    ).collect():
        assert r.d == r.expected


def test_url_helpers(spark):
    url = "https://host.example.org/a/b/page-001.html"
    df = spark.createDataFrame([(url,)], ["url"])
    row = df.select(
        url_stem_expr("url").alias("stem"), url_dirname_expr("url").alias("dir")
    ).collect()[0]
    assert row.stem == "page-001" == textsim.url_stem(url)
    assert row.dir == "https://host.example.org/a/b" == textsim.url_dirname(url)


def test_tokens_min_len(spark):
    df = spark.createDataFrame([("go to the big house",)], ["text"])
    toks = set(df.select(tokens_expr("text").alias("t")).collect()[0].t)
    assert toks == {"the", "big", "house"}


def test_p13_fallback_coalesce(spark):
    """P13 (main_cli.cpp:654-671): NULL primary score falls back to the
    name rules; present primary wins; excel variant gates on both ratio
    and name."""
    from mediaduplicatefinder_spark.operators.similarity import with_fallback_score

    rows = [
        # (batch_score, name_sim, size_ratio)
        (0.9, 0.1, 0.5),   # primary present + similar
        (0.4, 0.99, 0.99), # primary present, below gate -> not similar
        (None, 0.8, 0.95), # failed -> name fallback fires
        (None, 0.5, 0.99), # failed -> name gate misses
    ]
    df = spark.createDataFrame(
        rows, "batch_score double, name_sim double, size_ratio double"
    )
    word = {
        (r.batch_score, r.name_sim): (r.score, r.similar, r.used_fallback)
        for r in with_fallback_score(df).collect()
    }
    assert word[(0.9, 0.1)] == (0.9, True, False)
    assert word[(0.4, 0.99)] == (0.4, False, False)
    assert word[(None, 0.8)] == (0.8, True, True)
    assert word[(None, 0.5)] == (0.5, False, True)

    excel = {
        (r.batch_score, r.name_sim): (r.score, r.similar, r.used_fallback)
        for r in with_fallback_score(df, size_ratio_col="size_ratio").collect()
    }
    assert excel[(None, 0.8)] == ((0.95 + 0.8) / 2, True, True)
    assert excel[(None, 0.5)][1] is False  # name gate fails despite ratio
