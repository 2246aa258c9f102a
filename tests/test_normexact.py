"""E114 normalized-exact dedup (operators/normexact.py)."""

from __future__ import annotations

from mediaduplicatefinder_spark.operators.normexact import (
    normalized_exact_families,
)


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {r.doc_id: r for r in normalized_exact_families(df).collect()}


def test_rerenders_collapse(spark):
    got = _run(
        spark,
        [
            (1, "hello world again"),
            (2, "Hello World Again"),  # case
            (3, "hello, world... again!!!"),  # punctuation
            (4, "hello   world\tagain"),  # whitespace
            (5, "hello world againx"),  # actually different
        ],
    )
    fam = [got[i] for i in (1, 2, 3, 4)]
    assert all(r.family_size == 4 for r in fam)
    assert [r.is_winner for r in fam] == [True, False, False, False]
    assert got[5].family_size == 1 and got[5].is_winner


def test_was_normalized_evidence(spark):
    got = _run(
        spark,
        [(1, "already canonical text"), (2, "Already Canonical, Text")],
    )
    assert not got[1].was_normalized
    assert got[2].was_normalized
    assert got[1].family_size == 2  # still one family


def test_leading_trailing_whitespace(spark):
    got = _run(spark, [(1, "  padded text  "), (2, "padded text")])
    assert got[1].family_size == 2
    assert got[1].was_normalized and not got[2].was_normalized


def test_empty_and_punct_only_collapse_together(spark):
    # both normalize to '' -> one family (the exact-dup empty rule E1
    # shares: byte-identical nothingness)
    got = _run(spark, [(1, ""), (2, "!!! ???")])
    assert got[1].family_size == 2
