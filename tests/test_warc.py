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


# ---------------------------------------------------------------- warc.gz


def test_gz_roundtrip_matches_plain(spark):
    """Same records through .warc and .warc.gz parse identically."""
    from mediaduplicatefinder_spark.operators.warc import (
        build_warc_gz,
        parse_warc_gz,
    )

    recs = [
        {
            "type": "response",
            "url": f"https://h/{i}",
            "ts": TS,
            "body": _html(i, "x\r\n\r\ny" * i),
        }
        for i in range(5)
    ] + [{"type": "request", "url": "https://h/req", "ts": TS, "body": b"GET"}]
    plain = spark.createDataFrame(
        [("s", build_warc_bytes(recs))], "segment_id string, data binary"
    )
    gz = spark.createDataFrame(
        [("s", build_warc_gz(recs))], "segment_id string, data binary"
    )
    key = lambda r: (r.url, r.warc_ts, bytes(r.html or b""), r.record_type)
    a = sorted(map(key, parse_warc(plain).collect()))
    b = sorted(map(key, parse_warc_gz(gz).collect()))
    assert a == b and len(a) == 5


def test_gz_member_boundaries_are_seek_points():
    """One gzip member per record: each member must decompress alone."""
    import zlib

    from mediaduplicatefinder_spark.operators.warc import build_warc_gz

    recs = [
        {"type": "response", "url": f"u{i}", "ts": TS, "body": b"b" * i}
        for i in range(3)
    ]
    data = build_warc_gz(recs)
    members = 0
    while data:
        obj = zlib.decompressobj(16 + zlib.MAX_WBITS)
        out = obj.decompress(data)
        assert out.startswith(b"WARC/1.0\r\n") and obj.eof
        members += 1
        data = obj.unused_data
    assert members == 3


def test_gz_corrupt_member_marks_and_stops(spark):
    from mediaduplicatefinder_spark.operators.warc import (
        build_warc_gz,
        parse_warc_gz,
    )

    recs = [
        {"type": "response", "url": f"u{i}", "ts": TS, "body": _html(i, "x")}
        for i in range(4)
    ]
    good = build_warc_gz(recs[:2])
    # flip a byte inside the third member's deflate body
    third = build_warc_gz(recs[2:3])
    broken = bytearray(third)
    broken[20] ^= 0xFF
    data = good + bytes(broken) + build_warc_gz(recs[3:])
    rows = parse_warc_gz(
        spark.createDataFrame(
            [("s", data)], "segment_id string, data binary"
        )
    ).collect()
    oks = [r for r in rows if r.parse_error is None]
    errs = [r for r in rows if r.parse_error is not None]
    assert {r.url for r in oks} == {"u0", "u1"}
    assert len(errs) == 1 and "gzip" in errs[0].parse_error


def test_gz_trailing_garbage_marks(spark):
    from mediaduplicatefinder_spark.operators.warc import (
        build_warc_gz,
        parse_warc_gz,
    )

    recs = [{"type": "response", "url": "u", "ts": TS, "body": _html(1, "x")}]
    data = build_warc_gz(recs) + b"NOT GZIP"
    rows = parse_warc_gz(
        spark.createDataFrame(
            [("s", data)], "segment_id string, data binary"
        )
    ).collect()
    assert [r.parse_error is None for r in rows].count(True) == 1
    assert any(
        r.parse_error and "bad gzip magic" in r.parse_error for r in rows
    )
