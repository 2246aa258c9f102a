"""E79 tf-weighted SimHash (functions/wsimhash.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mediaduplicatefinder_spark.functions.wsimhash import (
    WSH_PREFIX,
    WSH_WORD_WIDTH,
    weighted_simhash,
)


def _run(spark, texts):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    return {r.doc_id: r for r in weighted_simhash(df).collect()}


def _py_wsim(spark, text: str) -> tuple[int, int]:
    """Replay using Spark's own xxhash64 as the word-hash source."""
    import re

    words = [w for w in re.split(r"[^a-z0-9]+", text.lower()) if w]
    if not words:
        return 0, 0
    keys = [
        f"{WSH_PREFIX}{w[:WSH_WORD_WIDTH]:<{WSH_WORD_WIDTH}}" for w in words
    ]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    hs = [r.h for r in df.select(F.xxhash64("k").alias("h")).collect()]
    votes = [0] * 64
    for h in hs:
        u = h & ((1 << 64) - 1)
        for j in range(64):
            votes[j] += 2 * ((u >> j) & 1) - 1
    s = sum((1 << j) for j in range(64) if votes[j] > 0)
    return len(words), (s - (1 << 64)) if s >= (1 << 63) else s


def test_replay_parity(spark):
    texts = [
        "the cat sat on the mat",
        "spark spark spark join join filter",
        "",
        "a",  # single 1-char word
        "Unicode stays out: ASCII only here 123",
    ]
    got = _run(spark, texts)
    for i, t in enumerate(texts):
        nw, ws = _py_wsim(spark, t)
        assert got[i].n_words == nw, (i, t)
        assert got[i].wsimhash == ws, (i, t)


def test_empty_and_identical(spark):
    got = _run(spark, ["", "   ...   ", "same words here", "same words here"])
    assert got[0].wsimhash == 0 and got[0].n_words == 0
    assert got[1].wsimhash == 0 and got[1].n_words == 0
    assert got[2].wsimhash == got[3].wsimhash != 0


def test_tf_weighting_changes_fingerprint(spark):
    # same vocabulary, different emphasis -> different weighted prints
    a = "alpha beta gamma " + "boilerplate " * 1
    b = "alpha beta gamma " + "boilerplate " * 50
    got = _run(spark, [a, b])
    assert got[0].wsimhash != got[1].wsimhash
    # heavy repetition drags the print toward the repeated word's hash
    df = spark.createDataFrame(
        [
            (
                f"{WSH_PREFIX}{'boilerplate'[:WSH_WORD_WIDTH]:<{WSH_WORD_WIDTH}}",
            )
        ],
        "k string",
    )
    hb = df.select(F.xxhash64("k").alias("h")).collect()[0].h
    assert got[1].wsimhash == hb  # 50 votes dominate every bit


def test_order_invariance(spark):
    got = _run(spark, ["one two three two", "two one two three"])
    assert got[0].wsimhash == got[1].wsimhash
