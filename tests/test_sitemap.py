"""E97 sitemap extraction (operators/sitemap.py)."""

from __future__ import annotations

from mediaduplicatefinder_spark.operators.sitemap import (
    extract_sitemap_urls,
)

PAYLOAD = "\n".join(
    [
        '<?xml version="1.0"?><urlset>',
        "<url><loc>http://h/a</loc><lastmod>2026-01-02</lastmod>"
        "<changefreq>daily</changefreq></url>",
        "<url><loc>http://h/b</loc></url>",
        "<url><lastmod>2026-02-02</lastmod></url>",
        "<url><loc>http://h/c</loc><changefreq>weekly</changefreq></url>",
        "</urlset>",
    ]
)


def _run(spark, rows):
    df = spark.createDataFrame(rows, "host string, payload string")
    return extract_sitemap_urls(df).collect()


def test_block_field_matrix(spark):
    got = {r.loc: (r.lastmod, r.changefreq) for r in _run(spark, [("h", PAYLOAD)])}
    # the loc-less block is dropped; absent fields surface as NULL
    assert got == {
        "http://h/a": ("2026-01-02", "daily"),
        "http://h/b": (None, None),
        "http://h/c": (None, "weekly"),
    }


def test_host_carried_and_multiple_hosts(spark):
    rows = _run(spark, [("h1", PAYLOAD), ("h2", PAYLOAD)])
    assert {r.host for r in rows} == {"h1", "h2"}
    assert len(rows) == 6


def test_nongreedy_blocks_single_line(spark):
    # two blocks on ONE line: the lazy (.*?) must split them
    one_line = (
        "<urlset><url><loc>http://h/x</loc></url>"
        "<url><loc>http://h/y</loc></url></urlset>"
    )
    assert {r.loc for r in _run(spark, [("h", one_line)])} == {
        "http://h/x",
        "http://h/y",
    }


def test_first_tag_occurrence_wins(spark):
    doubled = "<url><loc>http://h/p</loc><loc>http://h/q</loc></url>"
    rows = _run(spark, [("h", doubled)])
    assert [r.loc for r in rows] == ["http://h/p"]


def test_empty_loc_and_degenerate_payloads(spark):
    rows = _run(
        spark,
        [
            ("h", "<url><loc></loc></url>"),  # empty loc dropped
            ("h", "no xml here"),  # no blocks at all
            ("h", None),  # NULL payload tolerated
        ],
    )
    assert rows == []
