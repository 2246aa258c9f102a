"""E38 WARC source: builder/parser round-trip, Content-Length-driven
body extraction (\\r\\n\\r\\n inside HTML must not split records),
non-response records skipped, malformed tails become marker rows not
exceptions, and the parsed rows feed the existing extractor
byte-identically."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from mediaduplicatefinder_spark.operators.extract import (
    extract_text,
    oracle_extract_text,
)
from mediaduplicatefinder_spark.operators.warc import (
    build_warc_bytes,
    parse_warc,
)

TS = dt.datetime(2026, 3, 1, 12, 0, 0)


def _html(i: int, body: str) -> bytes:
    return f"<html><head>h{i}</head><body>{body}</body></html>".encode()


def _segment(i: int) -> bytes:
    return build_warc_bytes(
        [
            {"type": "warcinfo", "url": f"seg{i}", "ts": TS,
             "body": b"software: test"},
            {"type": "request", "url": f"http://s{i}.example/a", "ts": TS,
             "body": b"GET /a HTTP/1.1"},
            {"type": "response", "url": f"http://s{i}.example/a",
             "ts": TS + dt.timedelta(minutes=i),
             "body": _html(i, f"page {i} alpha beta")},
            # body containing the record delimiter sequence
            {"type": "response", "url": f"http://s{i}.example/b",
             "ts": TS, "body": _html(i, "tricky\r\n\r\nbody")},
        ]
    )


def test_warc_round_trip(spark):
    segs = spark.createDataFrame(
        [(f"seg{i}", _segment(i)) for i in range(3)],
        "segment_id string, data binary",
    )
    rows = parse_warc(segs).collect()
    assert all(r["parse_error"] is None for r in rows)
    assert len(rows) == 6  # 2 responses per segment; others skipped
    by_url = {r["url"]: r for r in rows}
    for i in range(3):
        a = by_url[f"http://s{i}.example/a"]
        assert bytes(a["html"]) == _html(i, f"page {i} alpha beta")
        assert a["warc_ts"] == TS + dt.timedelta(minutes=i)
        b = by_url[f"http://s{i}.example/b"]
        assert bytes(b["html"]) == _html(i, "tricky\r\n\r\nbody")


def test_warc_malformed_tail_is_marker_not_throw(spark):
    good = _segment(0)
    truncated = good[: len(good) - 10]
    bad_magic = b"NOTWARC" + good
    segs = spark.createDataFrame(
        [("t", truncated), ("m", bad_magic)],
        "segment_id string, data binary",
    )
    rows = parse_warc(segs).collect()
    by_seg = {}
    for r in rows:
        by_seg.setdefault(r["segment_id"], []).append(r)
    # truncated: first response still parses; the damaged tail is a marker
    t_ok = [r for r in by_seg["t"] if r["parse_error"] is None]
    t_err = [r for r in by_seg["t"] if r["parse_error"] is not None]
    assert len(t_ok) >= 1 and len(t_err) == 1
    assert "truncated" in t_err[0]["parse_error"]
    # bad magic at offset 0: nothing parsed, one marker
    assert len(by_seg["m"]) == 1
    assert "bad magic" in by_seg["m"][0]["parse_error"]


def test_warc_feeds_extractor_byte_identically(spark):
    segs = spark.createDataFrame(
        [(f"seg{i}", _segment(i)) for i in range(2)],
        "segment_id string, data binary",
    )
    pages = (
        parse_warc(segs)
        .filter("parse_error IS NULL")
        .withColumn("lang", F.lit("en"))
        .select("url", "warc_ts", "html", "lang")
    )
    docs = {r["url"]: r["text"] for r in extract_text(pages).collect()}
    for i in range(2):
        expected = oracle_extract_text(_html(i, f"page {i} alpha beta"))
        assert docs[f"http://s{i}.example/a"] == expected
        assert docs[f"http://s{i}.example/b"] == oracle_extract_text(
            _html(i, "tricky\r\n\r\nbody")
        )
