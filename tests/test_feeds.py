"""E124 RSS/Atom feed extraction (operators/feeds.py)."""

from __future__ import annotations

from mediaduplicatefinder_spark.operators.feeds import extract_feed_urls

RSS = (
    "<rss><channel>"
    "<item><link>http://h/r1</link><pubDate>Mon, 01 Aug 2026</pubDate></item>"
    "<item><link>http://h/r2</link></item>"
    "<item><pubDate>urlless</pubDate></item>"
    "</channel></rss>"
)
ATOM = (
    "<feed>"
    '<entry><link rel="alternate" href="http://h/a1"/>'
    "<published>2026-08-01</published></entry>"
    '<entry><link href="http://h/a2"/></entry>'
    "</feed>"
)


def _run(spark, rows):
    df = spark.createDataFrame(rows, "host string, payload string")
    return {
        (r.host, r.loc): r for r in extract_feed_urls(df).collect()
    }


def test_rss_items(spark):
    got = _run(spark, [("h", RSS)])
    assert set(got) == {("h", "http://h/r1"), ("h", "http://h/r2")}
    assert got[("h", "http://h/r1")].published == "Mon, 01 Aug 2026"
    assert got[("h", "http://h/r1")].fmt == "rss"
    assert got[("h", "http://h/r2")].published is None


def test_atom_entries(spark):
    got = _run(spark, [("h", ATOM)])
    assert set(got) == {("h", "http://h/a1"), ("h", "http://h/a2")}
    assert got[("h", "http://h/a1")].published == "2026-08-01"
    assert got[("h", "http://h/a1")].fmt == "atom"


def test_mixed_and_degenerate(spark):
    got = _run(
        spark,
        [("h", RSS + ATOM), ("empty", "<html>not a feed</html>"), ("n", None)],
    )
    assert len(got) == 4  # 2 rss + 2 atom; url-less item dropped
    assert {r.fmt for r in got.values()} == {"rss", "atom"}
    assert not any(h == "empty" for h, _ in got)
