"""E98 canonical-link collapse (operators/canonical.py)."""

from __future__ import annotations

from mediaduplicatefinder_spark.operators.canonical import (
    canonical_collapse,
)

HEAD = "http://h/a"


def _run(spark, rows):
    df = spark.createDataFrame(rows, "url string, html string")
    return {r.url: r for r in canonical_collapse(df).collect()}


def test_family_election_target_crawled(spark):
    got = _run(
        spark,
        [
            (HEAD, "<html><head></head></html>"),  # self-canonical target
            ("http://h/b", f'<link rel="canonical" href="{HEAD}">'),
            ("http://h/c", f'<link href="{HEAD}" rel="canonical">'),
            ("http://h/d", f'<meta property="og:url" content="{HEAD}">'),
            ("http://h/z", "<p>standalone</p>"),
        ],
    )
    fam = [got[u] for u in (HEAD, "http://h/b", "http://h/c", "http://h/d")]
    assert all(r.canon_target == HEAD and r.group_size == 4 for r in fam)
    assert [r.is_winner for r in fam] == [True, False, False, False]
    assert not got[HEAD].declared and got["http://h/b"].declared
    # standalone page is its own singleton family
    z = got["http://h/z"]
    assert (z.canon_target, z.group_size, z.is_winner) == ("http://h/z", 1, True)


def test_winner_min_url_when_target_not_crawled(spark):
    got = _run(
        spark,
        [
            ("http://h/m2", f'<link rel="canonical" href="{HEAD}">'),
            ("http://h/m1", f'<link rel="canonical" href="{HEAD}">'),
        ],
    )
    assert got["http://h/m1"].is_winner and not got["http://h/m2"].is_winner
    assert got["http://h/m1"].group_size == 2


def test_link_beats_og_url(spark):
    html = (
        f'<link rel="canonical" href="{HEAD}">'
        '<meta property="og:url" content="http://decoy/x">'
    )
    got = _run(spark, [("http://h/p", html)])
    assert got["http://h/p"].canon_target == HEAD


def test_extra_attributes_and_null_html(spark):
    got = _run(
        spark,
        [
            (
                "http://h/q",
                f'<link data-x="1" rel="canonical" type="text/html" href="{HEAD}">',
            ),
            ("http://h/r", None),
        ],
    )
    assert got["http://h/q"].canon_target == HEAD
    r = got["http://h/r"]
    assert (r.canon_target, r.declared, r.is_winner) == ("http://h/r", False, True)
