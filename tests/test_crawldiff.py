"""E84 crawl snapshot diff + host churn (operators/crawldiff.py)."""

from __future__ import annotations

from mediaduplicatefinder_spark.operators.crawldiff import (
    crawl_diff,
    host_churn,
)

SCHEMA = "url string, host string, text string"


def test_all_statuses(spark):
    old = spark.createDataFrame(
        [
            ("u1", "a", "same"),
            ("u2", "a", "before"),
            ("u3", "b", "will vanish"),
        ],
        SCHEMA,
    )
    new = spark.createDataFrame(
        [
            ("u1", "a", "same"),
            ("u2", "a", "after"),
            ("u4", "b", "fresh"),
        ],
        SCHEMA,
    )
    d = {r.url: r for r in crawl_diff(old, new).collect()}
    assert d["u1"].status == "UNCHANGED"
    assert d["u2"].status == "CHANGED"
    assert d["u3"].status == "GONE" and d["u3"].host == "b"
    assert d["u4"].status == "NEW" and d["u4"].host == "b"
    assert len(d) == 4


def test_churn_rollup(spark):
    old = spark.createDataFrame(
        [("u%d" % i, "h", "t%d" % i) for i in range(10)], SCHEMA
    )
    new = spark.createDataFrame(
        # 0-5 survive (0-2 changed), 6-9 gone, 2 fresh urls
        [("u%d" % i, "h", ("x" if i < 3 else "t") + "%d" % i) for i in range(6)]
        + [("n%d" % i, "h", "new%d" % i) for i in range(2)],
        SCHEMA,
    )
    r = host_churn(crawl_diff(old, new)).collect()[0]
    assert (r.n_new, r.n_gone, r.n_changed, r.n_unchanged) == (2, 4, 3, 3)
    assert r.change_rate == round(3 / 6, 6)


def test_no_overlap_host(spark):
    old = spark.createDataFrame([("u1", "h", "a")], SCHEMA)
    new = spark.createDataFrame([("u2", "h", "b")], SCHEMA)
    r = host_churn(crawl_diff(old, new)).collect()[0]
    assert (r.n_new, r.n_gone, r.n_changed, r.n_unchanged) == (1, 1, 0, 0)
    assert r.change_rate == 0.0
