"""E85 anchor-text host profiles (operators/anchortext.py)."""

from __future__ import annotations

from mediaduplicatefinder_spark.operators.anchortext import (
    host_anchor_terms,
)


def _pages(spark, htmls):
    return spark.createDataFrame([(h,) for h in htmls], "html string")


def test_basic_profile(spark):
    htmls = [
        '<a href="http://x.com/a">Great Site</a>'
        '<a href="http://x.com/b">great deals</a>',
        '<a href="http://x.com/c">great</a>'
        '<a href="http://y.com/">other place</a>',
    ]
    rows = host_anchor_terms(_pages(spark, htmls)).collect()
    by = {(r.host, r.term): r for r in rows}
    assert by[("x.com", "great")].cnt == 3
    assert by[("x.com", "great")].rnk == 1
    assert by[("x.com", "deals")].cnt == 1
    assert by[("y.com", "other")].rnk <= 2
    # tie-break: equal counts rank alphabetically
    x_terms = sorted(
        (r.rnk, r.term) for r in rows if r.host == "x.com"
    )
    tied = [t for rnk, t in x_terms if rnk > 1]
    assert tied == sorted(tied)


def test_top_k_cap(spark):
    html = "".join(
        f'<a href="http://z.com/{i}">word{i}</a>' for i in range(12)
    )
    rows = host_anchor_terms(_pages(spark, [html]), top_k=5).collect()
    assert len(rows) == 5
    assert sorted(r.rnk for r in rows) == [1, 2, 3, 4, 5]
    # all counts 1 -> alphabetical winners (word0, word1, word10, ...)
    assert [r.term for r in sorted(rows, key=lambda r: r.rnk)] == sorted(
        [f"word{i}" for i in range(12)]
    )[:5]


def test_ignores_malformed(spark):
    htmls = [
        '<a href="https://ssl.com/x">skipped https</a>',
        '<a href="/relative">skipped relative</a>',
        "<p>no anchors at all</p>",
        '<a href="http://ok.com/x">kept</a>',
    ]
    rows = host_anchor_terms(_pages(spark, htmls)).collect()
    assert {r.host for r in rows} == {"ok.com"}
