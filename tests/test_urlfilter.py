"""E61 URL filtering (functions/urlfilter.py): label-boundary domain
blocklisting via suffix-explode equi-join + weighted keyword scoring.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mediaduplicatefinder_spark.functions.urlfilter import (
    KW_THRESHOLD,
    host_suffixes_expr,
    url_filter,
)


def _run(spark, urls, blocklist_rows=None):
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id long, url string"
    )
    bl = None
    if blocklist_rows is not None:
        bl = spark.createDataFrame(
            [(d,) for d in blocklist_rows], "blocked_domain_name string"
        )
    return {r.url: r for r in url_filter(df, bl).collect()}


def test_domain_label_boundary(spark):
    out = _run(
        spark,
        [
            "https://example.org/a",          # exact -> blocked
            "https://ads.example.org/a",      # subdomain -> blocked
            "https://a.b.example.org/a",      # deep subdomain -> blocked
            "https://notexample.org/a",       # NOT a label match
            "https://example.org.evil.com/a", # suffix is com, not ex.org
            "https://www.example.org/a",      # www strips -> exact host
        ],
        blocklist_rows=["example.org"],
    )
    assert out["https://example.org/a"].blocked_domain
    assert out["https://ads.example.org/a"].blocked_domain
    assert out["https://a.b.example.org/a"].blocked_domain
    assert not out["https://notexample.org/a"].blocked_domain
    assert not out["https://example.org.evil.com/a"].blocked_domain
    assert out["https://www.example.org/a"].blocked_domain


def test_keyword_scoring_and_threshold(spark):
    out = _run(
        spark,
        [
            "https://x.com/clean",
            "https://x.com/CASINO",        # 2.0 -> blocked (>= 2.0)
            "https://x.com/poker",         # 1.5 -> kept
            "https://x.com/poker/win-big", # 1.5 + 0.5 -> blocked
            "https://x.com/free-download", # 0.5 -> kept
            "https://x.com/poker-poker",   # 2 * 1.5 = 3.0 -> blocked
        ],
        blocklist_rows=["nowhere.invalid"],
    )
    c = out["https://x.com/clean"]
    assert c.kw_score == 0.0 and not c.blocked_kw and c.keep
    assert out["https://x.com/CASINO"].kw_score == 2.0
    assert out["https://x.com/CASINO"].blocked_kw
    assert out["https://x.com/poker"].kw_score == 1.5
    assert not out["https://x.com/poker"].blocked_kw
    assert out["https://x.com/poker/win-big"].kw_score == 2.0
    assert out["https://x.com/poker/win-big"].blocked_kw
    assert out["https://x.com/poker-poker"].kw_score == 3.0
    assert KW_THRESHOLD == 2.0


def test_keep_is_conjunction(spark):
    out = _run(
        spark,
        ["https://bad.org/casino", "https://bad.org/a", "https://ok.org/a"],
        blocklist_rows=["bad.org"],
    )
    assert not out["https://bad.org/casino"].keep   # both verdicts
    assert not out["https://bad.org/a"].keep        # domain only
    assert out["https://ok.org/a"].keep


def test_host_suffixes(spark):
    row = (
        spark.createDataFrame([("a.b.c.org",)], "h string")
        .select(host_suffixes_expr(F.col("h")).alias("s"))
        .collect()[0]
    )
    assert row.s == ["a.b.c.org", "b.c.org", "c.org", "org"]


def test_blocklist_join_is_broadcast(spark):
    df = spark.createDataFrame([(1, "https://x.org/a")], "doc_id long, url string")
    plan = url_filter(df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
