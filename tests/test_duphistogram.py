"""E125 duplicate-family size histogram (operators/duphistogram.py)."""

from __future__ import annotations

from mediaduplicatefinder_spark.operators.duphistogram import (
    dup_family_histogram,
)


def _run(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    return {
        r.family_size: r for r in dup_family_histogram(df).collect()
    }


def test_closed_form_histogram(spark):
    texts = ["pair"] * 2 + ["trio"] * 3 + ["other-trio"] * 3 + ["solo"]
    got = _run(spark, texts)
    assert set(got) == {2, 3}  # singletons never appear
    assert got[2].n_families == 1 and got[2].n_docs == 2
    assert got[2].wasted_docs == 1
    assert got[2].wasted_bytes == len("pair")
    assert got[3].n_families == 2 and got[3].n_docs == 6
    assert got[3].wasted_docs == 4
    assert got[3].wasted_bytes == 2 * len("trio") + 2 * len("other-trio")


def test_no_duplicates_empty_histogram(spark):
    assert _run(spark, ["a", "b", "c"]) == {}


def test_bytes_are_utf8_octets(spark):
    texts = ["café"] * 2  # 5 utf-8 bytes, 4 codepoints
    got = _run(spark, texts)
    assert got[2].wasted_bytes == 5
