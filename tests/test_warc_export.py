"""E151 WARC sink: parse(export(x)) == x at record grain, byte-level
determinism across parallelism (the value-comparable-segments
contract), the gz layout, and unicode body-length fidelity."""

from __future__ import annotations

import datetime

import pytest

from mediaduplicatefinder_spark.operators.warc import (
    export_warc,
    parse_warc,
    parse_warc_gz,
)


@pytest.fixture(scope="module")
def pages(spark):
    base = datetime.datetime(2026, 2, 1)
    rows = [
        (
            f"http://h{i % 3}.example.org/p{i}",
            base + datetime.timedelta(seconds=i),
            f"<html><body>doc {i} body é中</body></html>".encode(),
            str(i % 4),
        )
        for i in range(37)
    ]
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, segment_id string"
    )


def test_roundtrip_identity(spark, pages):
    segs = export_warc(pages)
    back = parse_warc(segs.select("segment_id", "data"))
    got = {
        r["url"]: (r["warc_ts"], bytes(r["html"]))
        for r in back.filter("parse_error IS NULL").collect()
    }
    want = {
        r["url"]: (r["warc_ts"], bytes(r["html"])) for r in pages.collect()
    }
    assert got == want


def test_segment_bytes_deterministic(spark, pages):
    a = {r["segment_id"]: bytes(r["data"]) for r in export_warc(pages).collect()}
    b = {
        r["segment_id"]: bytes(r["data"])
        for r in export_warc(pages.repartition(7)).collect()
    }
    assert a == b
    assert len(a) == 4


def test_record_and_byte_counts(spark, pages):
    for r in export_warc(pages).collect():
        assert r["n_bytes"] == len(bytes(r["data"]))
        assert r["n_records"] > 0
    total = sum(r["n_records"] for r in export_warc(pages).collect())
    assert total == 37


def test_gz_layout_roundtrip(spark, pages):
    segs = export_warc(pages, gz=True)
    back = parse_warc_gz(segs.select("segment_id", "data"))
    got = {r["url"] for r in back.filter("parse_error IS NULL").collect()}
    assert got == {r["url"] for r in pages.collect()}
    # per-record gzip: plain and gz segment bytes must differ
    plain = {r["segment_id"]: r["n_bytes"] for r in export_warc(pages).collect()}
    gzb = {r["segment_id"]: r["n_bytes"] for r in segs.collect()}
    assert plain != gzb
