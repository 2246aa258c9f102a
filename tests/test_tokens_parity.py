"""The three tokenizers (Spark expr, UDF core, oracle) must coincide —
the whole recall argument rests on it (SURVEY.md §5.2 layer 1)."""

from __future__ import annotations

import pytest

from mediaduplicatefinder_spark.functions.sigcore import token_seq
from mediaduplicatefinder_spark.functions.text import tokens_expr
from mediaduplicatefinder_spark.oracle.textsim import extract_words

CASES = [
    "Hello, World! foo-bar baz_qux",
    "a ab abc abcd",  # length filter: keep len > 2 (main_cli.cpp:280)
    "",
    "   \t\n  ",
    "UPPER lower MiXeD",
    "tab\tsep\nnewline  double  space",
    "num8er5 m1xed 42 123",  # digits are alnum
    "dup dup dup uniq",  # set semantics
    "trailing! !leading mi!ddle",
    "x" * 300 + " yy zzz",  # long token, short tokens
]


@pytest.mark.parametrize("text", CASES)
def test_python_cores_agree(text):
    assert set(token_seq(text)) == extract_words(text)


def test_spark_expr_agrees(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CASES)], ["id", "text"])
    rows = df.select("id", tokens_expr("text").alias("toks")).collect()
    for r in rows:
        assert set(r.toks) == extract_words(CASES[r.id]), CASES[r.id]


def test_dedupe_and_order_insensitivity():
    assert sorted(token_seq("beta alpha beta")) == ["alpha", "beta", "beta"]
    assert set(token_seq("beta alpha beta")) == {"alpha", "beta"}
    assert extract_words("beta alpha beta") == {"alpha", "beta"}
