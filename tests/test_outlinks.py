"""E111 outlink profiling (functions/outlinks.py)."""

from __future__ import annotations

from mediaduplicatefinder_spark.functions.outlinks import outlink_profile

EXT = '<a href="http://other.example/x">o</a>'
INT = '<a href="http://h.example/own">i</a>'


def _run(spark, rows):
    df = spark.createDataFrame(rows, "url string, html string")
    return {r.url: r for r in outlink_profile(df).collect()}


def test_internal_external_split(spark):
    got = _run(
        spark,
        [
            (
                "http://h.example/p",
                INT + '<a href="/relative">r</a>' + EXT,
            )
        ],
    )
    r = got["http://h.example/p"]
    # relative hrefs count internal; same-host absolute internal
    assert (r.n_links, r.n_external, r.n_internal) == (3, 1, 2)
    assert not r.is_link_farm


def test_farm_flag_thresholds(spark):
    got = _run(
        spark,
        [
            ("http://h.example/farm", EXT * 20),  # 20 links 100% ext
            ("http://h.example/near", EXT * 19),  # under link minimum
            ("http://h.example/mixed", (INT + EXT) * 10),  # 50% ext
            ("http://h.example/edge", INT * 2 + EXT * 18),  # 90% exact
        ],
    )
    assert got["http://h.example/farm"].is_link_farm
    assert not got["http://h.example/near"].is_link_farm
    assert not got["http://h.example/mixed"].is_link_farm
    assert got["http://h.example/edge"].is_link_farm  # 18*100 >= 90*20


def test_nofollow_and_linkless(spark):
    got = _run(
        spark,
        [
            (
                "http://h.example/p",
                '<a rel="nofollow" href="http://s.example/a">n</a>' + INT,
            ),
            ("http://h.example/empty", "<p>prose only</p>"),
        ],
    )
    assert got["http://h.example/p"].n_nofollow == 1
    e = got["http://h.example/empty"]
    assert (e.n_links, e.is_link_farm) == (0, False)
