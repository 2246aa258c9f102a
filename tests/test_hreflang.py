"""E102 hreflang translation families (operators/hreflang.py)."""

from __future__ import annotations

from mediaduplicatefinder_spark.operators.hreflang import (
    hreflang_families,
)


def _alt(lang, href):
    return f'<link rel="alternate" hreflang="{lang}" href="{href}">'


def _run(spark, rows):
    df = spark.createDataFrame(rows, "url string, html string")
    return {r.url: r for r in hreflang_families(df).collect()}


def test_symmetric_family(spark):
    got = _run(
        spark,
        [
            ("u/en", _alt("de", "u/de") + _alt("fr", "u/fr")),
            ("u/de", _alt("en", "u/en") + _alt("fr", "u/fr")),
            ("u/fr", _alt("en", "u/en") + _alt("de", "u/de")),
            ("lonely", "<p>no alternates</p>"),
        ],
    )
    assert "lonely" not in got  # degree-0 pages are absent
    assert len(got) == 3
    fam = {r.family_id for r in got.values()}
    assert fam == {"u/de"}  # min url in the component
    assert all(r.family_size == 3 and r.n_langs == 3 for r in got.values())


def test_asymmetric_declaration_connects_family(spark):
    got = _run(
        spark,
        [
            ("u/en", _alt("de", "u/de") + _alt("fr", "u/fr")),
            ("u/de", "<p>silent</p>"),
            ("u/fr", "<p>silent</p>"),
        ],
    )
    assert len(got) == 3
    assert all(r.family_size == 3 for r in got.values())
    assert got["u/de"].n_langs == 2  # de + fr declared (by en only)


def test_self_reference_counts_lang_but_no_edge(spark):
    got = _run(
        spark,
        [
            ("u/en", _alt("x-default", "u/en") + _alt("de", "u/de")),
            ("u/de", ""),
        ],
    )
    assert got["u/en"].family_size == 2
    assert got["u/en"].n_langs == 2  # x-default + de


def test_two_disjoint_families(spark):
    got = _run(
        spark,
        [
            ("a/en", _alt("de", "a/de")),
            ("b/en", _alt("de", "b/de")),
        ],
    )
    assert got["a/en"].family_id != got["b/en"].family_id
    assert got["a/de"].family_size == 2 and got["b/de"].family_size == 2
