"""E118 HTTP response-header extraction (functions/httpheaders.py)."""

from __future__ import annotations

from mediaduplicatefinder_spark.functions.httpheaders import (
    parse_http_headers,
)

CRLF = "\r\n"


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, payload string")
    return {r.doc_id: r for r in parse_http_headers(df).collect()}


def test_full_response(spark):
    payload = (
        "HTTP/1.1 200 OK" + CRLF
        + "Content-Type: Text/HTML; charset=UTF-8" + CRLF
        + 'ETag: "abc123"' + CRLF
        + "Last-Modified: Mon, 17 Aug 2026 01:02:03 GMT" + CRLF + CRLF
        + "<html>body</html>"
    )
    r = _run(spark, [(1, payload)])[1]
    assert r.status == 200 and r.is_ok
    assert r.content_type == "text/html"  # lowered, param stripped
    assert r.charset == "utf-8"
    assert r.etag == "abc123"  # unquoted
    assert r.last_modified == "Mon, 17 Aug 2026 01:02:03 GMT"
    assert r.body_len == len("<html>body</html>")


def test_status_variants(spark):
    got = _run(
        spark,
        [
            (1, "HTTP/1.1 404 Not Found" + CRLF + CRLF + "x"),
            (2, "HTTP/1.0 301 Moved" + CRLF + "Location: /y" + CRLF + CRLF),
            (3, "no http head at all, just content"),
        ],
    )
    assert got[1].status == 404 and not got[1].is_ok
    assert got[2].status == 301 and got[2].body_len == 0
    r3 = got[3]
    assert r3.status is None and not r3.is_ok
    assert r3.body_len == len("no http head at all, just content")
    assert r3.content_type is None


def test_header_matching_is_line_anchored(spark):
    # a body mentioning 'Content-Type:' must not pollute the fields
    payload = (
        "HTTP/1.1 200 OK" + CRLF + CRLF
        + "Content-Type: application/evil" + CRLF + "tail"
    )
    r = _run(spark, [(1, payload)])[1]
    assert r.content_type is None  # header block had no content-type


def test_etag_without_quotes(spark):
    payload = "HTTP/1.1 200 OK" + CRLF + "ETag: bare-tag" + CRLF + CRLF
    assert _run(spark, [(1, payload)])[1].etag == "bare-tag"
