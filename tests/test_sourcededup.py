"""E120 cross-source priority dedup (operators/sourcededup.py)."""

from __future__ import annotations

from mediaduplicatefinder_spark.operators.sourcededup import (
    source_priority_dedup,
)


def _run(spark, rows):
    df = spark.createDataFrame(rows, "source string, doc_id long, text string")
    return {r.doc_id: r for r in source_priority_dedup(df).collect()}


def test_wiki_beats_books_beats_web(spark):
    got = _run(
        spark,
        [
            ("web", 1, "same text"),
            ("wiki", 2, "same text"),
            ("books", 3, "same text"),
            ("web", 4, "unique"),
        ],
    )
    assert [got[i].is_kept for i in (1, 2, 3)] == [False, True, False]
    assert got[1].family_size == 3 and got[1].n_sources == 3
    assert got[4].is_kept and got[4].family_size == 1


def test_doc_id_tiebreak_within_source(spark):
    got = _run(
        spark,
        [("web", 9, "t"), ("web", 3, "t"), ("web", 5, "t")],
    )
    assert got[3].is_kept and not got[9].is_kept and not got[5].is_kept
    assert got[3].n_sources == 1


def test_unknown_source_loses_to_known(spark):
    got = _run(
        spark,
        [("mystery", 1, "t"), ("web", 2, "t")],
    )
    assert got[2].is_kept and not got[1].is_kept
    assert got[1].priority == 9
