"""E103 main-content extraction (functions/boilerplate.py)."""

from __future__ import annotations

from mediaduplicatefinder_spark.functions.boilerplate import (
    extract_main_content,
)

PARA = "This paragraph carries enough plain prose to count as content."


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, html string")
    return {r.doc_id: r for r in extract_main_content(df, **kw).collect()}


def test_nav_dropped_content_kept(spark):
    html = (
        "<html><head><title>x</title></head><body>"
        '<div><a href="/">Home page link</a> <a href="/a">About us page</a></div>'
        f"<p>{PARA}</p>"
        "</body></html>"
    )
    r = _run(spark, [(1, html)])[1]
    assert r.n_blocks == 2
    assert r.n_content == 1
    assert r.content_text == PARA
    assert r.content_len == len(PARA)


def test_script_style_and_head_stripped(spark):
    html = (
        "<head><title>Title text that must never leak into content</title>"
        "</head><body>"
        "<script>var boilerplate_looking_long_string = 'aaaaaaaaaaaa';</script>"
        "<style>.c { margin: 0 auto; padding: 10px 20px 30px; }</style>"
        f"<p>{PARA}</p></body>"
    )
    r = _run(spark, [(1, html)])[1]
    assert r.content_text == PARA


def test_short_blocks_dropped_and_order_kept(spark):
    html = f"<body><p>First. {PARA}</p><p>Tiny.</p><p>Second. {PARA}</p></body>"
    r = _run(spark, [(1, html)])[1]
    assert r.n_blocks == 3 and r.n_content == 2
    assert r.content_text == f"First. {PARA} Second. {PARA}"


def test_link_density_boundary(spark):
    # stripped tags become a space: block text = anchor + ' ' + plain.
    # anchor 20 / text 40 -> 2*al == len -> dropped at the boundary
    anchor = "x" * 20
    plain = "y" * 19
    html = f'<body><p><a href="/">{anchor}</a>{plain}</p></body>'
    r = _run(spark, [(1, html)], min_len=10)[1]
    assert r.n_content == 0
    # one more plain char flips it to content (2*20 < 41)
    html2 = f'<body><p><a href="/">{anchor}</a>{plain}z</p></body>'
    r2 = _run(spark, [(1, html2)], min_len=10)[1]
    assert r2.n_content == 1


def test_no_body_tag_keeps_everything(spark):
    r = _run(spark, [(1, f"<p>{PARA}</p>")])[1]
    assert r.content_text == PARA
