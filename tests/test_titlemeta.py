"""E107 title-duplicate families (functions/titlemeta.py)."""

from __future__ import annotations

from mediaduplicatefinder_spark.functions.titlemeta import (
    title_dup_families,
)


def _run(spark, rows):
    df = spark.createDataFrame(rows, "host string, url string, html string")
    return {r.url: r for r in title_dup_families(df).collect()}


def test_case_and_whitespace_variants_collide(spark):
    got = _run(
        spark,
        [
            ("h", "u1", "<title>Widget Overview</title>"),
            ("h", "u2", "<title>WIDGET   OVERVIEW</title>"),
            ("h", "u3", "<title> widget overview </title>"),
            ("h", "u4", "<title>Other Page</title>"),
        ],
    )
    assert got["u1"].norm_title == "widget overview"
    assert all(got[u].family_size == 3 for u in ("u1", "u2", "u3"))
    assert [got[u].is_winner for u in ("u1", "u2", "u3")] == [True, False, False]
    assert got["u4"].family_size == 1 and got["u4"].is_winner


def test_families_are_per_host(spark):
    got = _run(
        spark,
        [
            ("a", "u1", "<title>Same</title>"),
            ("b", "u2", "<title>Same</title>"),
        ],
    )
    assert got["u1"].family_size == 1 and got["u2"].family_size == 1


def test_untitled_pages_dropped_desc_len(spark):
    got = _run(
        spark,
        [
            ("h", "u1", '<title>T</title><meta name="description" content="hello">'),
            ("h", "u2", "<p>no title</p>"),
            ("h", "u3", "<title></title>"),
        ],
    )
    assert set(got) == {"u1"}
    assert got["u1"].desc_len == 5
