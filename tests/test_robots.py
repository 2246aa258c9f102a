"""E95 robots.txt parsing + URL evaluation (operators/robots.py)."""

from __future__ import annotations

from mediaduplicatefinder_spark.operators.robots import (
    evaluate_urls,
    parse_robots_rules,
)

PAYLOAD = """# demo
User-agent: googlebot
Disallow: /gbot

User-agent: *
Disallow: /private
Allow: /private/pub
Disallow: /tmp      # trailing comment
Disallow:
Disallow: /wild*card
Disallow: /anchor$

User-agent: other
Disallow: /
"""


def _rules(spark, payloads):
    df = spark.createDataFrame(payloads, "host string, payload string")
    return parse_robots_rules(df)


def test_parse_group_and_subset_rules(spark):
    rules = {
        (r.rule_path, r.is_allow)
        for r in _rules(spark, [("h", PAYLOAD)]).collect()
    }
    # only the * group; empty disallow dropped; wildcard/anchor rejected
    assert rules == {
        ("/private", False),
        ("/private/pub", True),
        ("/tmp", False),
    }


def test_evaluation_matrix(spark):
    rules = _rules(spark, [("h", PAYLOAD), ("open", "User-agent: *\n")])
    urls = spark.createDataFrame(
        [
            ("h", "/private/pub/doc"),  # allow wins by length
            ("h", "/private/secret"),  # disallowed
            ("h", "/tmp/x"),  # disallowed
            ("h", "/public/ok"),  # no match -> allowed
            ("h", "/gbot/page"),  # googlebot group rule must NOT apply
            ("open", "/anything"),  # host with no rules
            ("nobody", "/x"),  # host with no robots at all
        ],
        "host string, path string",
    )
    got = {
        (r.host, r.path): r for r in evaluate_urls(urls, rules).collect()
    }
    assert got[("h", "/private/pub/doc")].allowed
    assert got[("h", "/private/pub/doc")].matched_rule == "/private/pub"
    assert not got[("h", "/private/secret")].allowed
    assert not got[("h", "/tmp/x")].allowed
    assert got[("h", "/public/ok")].allowed
    assert got[("h", "/public/ok")].matched_rule is None
    assert got[("h", "/gbot/page")].allowed
    assert got[("open", "/anything")].allowed
    assert got[("nobody", "/x")].allowed
    assert len(got) == 7  # one decision row per url


def test_allow_beats_disallow_on_tie(spark):
    payload = "User-agent: *\nDisallow: /a\nAllow: /a\n"
    rules = _rules(spark, [("h", payload)])
    urls = spark.createDataFrame([("h", "/a/x")], "host string, path string")
    r = evaluate_urls(urls, rules).collect()[0]
    assert r.allowed and r.matched_rule == "/a"


def test_sitemap_directives(spark):
    from mediaduplicatefinder_spark.operators.robots import (
        parse_robots_sitemaps,
    )

    payload = "\n".join(
        [
            "User-agent: *",
            "Disallow: /x",
            "Sitemap: http://h/s1.xml",
            "sitemap: http://h/s2.xml",  # case-insensitive key
            "SITEMAP:http://h/s3.xml",  # no space after colon
            "Sitemap: http://h/s4.xml   ",  # trailing whitespace
            " Sitemap: http://h/indented.xml",  # not line-anchored: skipped
            "Disallow: Sitemap: http://h/decoy.xml",  # mid-line: skipped
        ]
    )
    df = spark.createDataFrame(
        [("h", payload), ("h", payload), ("empty", "User-agent: *\n")],
        "host string, payload string",
    )
    got = {
        (r.host, r.sitemap_url)
        for r in parse_robots_sitemaps(df).collect()
    }
    assert got == {
        ("h", "http://h/s1.xml"),
        ("h", "http://h/s2.xml"),
        ("h", "http://h/s3.xml"),
        ("h", "http://h/s4.xml"),
    }


def test_crawl_delay(spark):
    from mediaduplicatefinder_spark.operators.robots import (
        parse_crawl_delay,
    )

    df = spark.createDataFrame(
        [
            ("a", "User-agent: *\nCrawl-delay: 2"),
            ("b", "User-agent: *\nCrawl-delay: 0.5"),
            ("c", "User-agent: *\nCrawl-delay: 1\nCrawl-delay: 10"),
            # group scoping: the * group's delay, not googlebot's
            ("d", "User-agent: googlebot\nCrawl-delay: 9\n"
                  "User-agent: *\nCrawl-delay: 3"),
            ("e", "User-agent: googlebot\nCrawl-delay: 9"),  # no * group
            ("f", "User-agent: *\nCrawl-delay: soon"),  # non-numeric
            ("g", "User-agent: *\nCrawl-delay: 1.25  # comment"),
        ],
        "host string, payload string",
    )
    got = {r.host: r.delay_ms for r in parse_crawl_delay(df).collect()}
    assert got == {"a": 2000, "b": 500, "c": 10000, "d": 3000, "g": 1250}
