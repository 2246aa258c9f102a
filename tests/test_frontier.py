"""E104 frontier seed discovery (operators/frontier.py)."""

from __future__ import annotations

from mediaduplicatefinder_spark.operators.frontier import frontier_seeds

SM_PAYLOAD = (
    "<urlset><url><loc>http://h/a</loc></url>"
    "<url><loc>http://h/b</loc></url></urlset>"
)


def _run(spark, pages, sitemaps):
    p = spark.createDataFrame(pages, "url string, html string")
    s = spark.createDataFrame(sitemaps, "host string, payload string")
    return {r.url: r for r in frontier_seeds(p, s).collect()}


def test_channels_union_and_priority(spark):
    got = _run(
        spark,
        [
            (
                "http://h/p1",
                # links the sitemap url (sitemap wins) + a fresh url
                '<a href="http://h/a">x</a><a href="http://h/new">y</a>'
                # declares a canonical target nobody crawled
                '<link rel="canonical" href="http://h/canon">',
            ),
        ],
        [("h", SM_PAYLOAD)],
    )
    assert set(got) == {"http://h/a", "http://h/b", "http://h/new", "http://h/canon"}
    assert got["http://h/a"].source == "sitemap"  # beats the link channel
    assert got["http://h/b"].source == "sitemap"
    assert got["http://h/new"].source == "link"
    assert got["http://h/canon"].source == "canonical"
    assert all(r.host == "h" for r in got.values())


def test_crawled_urls_leave_via_antijoin(spark):
    got = _run(
        spark,
        [
            ("http://h/p1", '<a href="http://h/p2">x</a>'),
            ("http://h/p2", '<a href="http://h/p1">y</a><a href="http://h/p3">z</a>'),
        ],
        [("h", "<urlset><url><loc>http://h/p1</loc></url></urlset>")],
    )
    # p1/p2 already crawled; only p3 survives
    assert set(got) == {"http://h/p3"}


def test_trap_scores_attached(spark):
    got = _run(
        spark,
        [("http://h/p", '<a href="http://t/cal/cal/x?sid=1">bad</a>')],
        [("h", "<urlset></urlset>")],
    )
    r = got["http://t/cal/cal/x?sid=1"]
    assert r.is_trap and r.trap_score == 7 and r.host == "t"


def test_link_beats_canonical(spark):
    got = _run(
        spark,
        [
            ("http://h/p1", '<a href="http://h/x">l</a>'),
            ("http://h/p2", '<link rel="canonical" href="http://h/x">'),
        ],
        [("h", "<urlset></urlset>")],
    )
    assert got["http://h/x"].source == "link"
