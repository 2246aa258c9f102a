"""Extraction invariant: byte-identical text per url vs the oracle
(BASELINE.json input_hint)."""

from __future__ import annotations

import datetime as dt

from mediaduplicatefinder_spark.operators.extract import (
    extract_text,
    oracle_extract_text,
)

TS = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)


def test_extraction_byte_identical(spark, tiny_corpus, tiny_pages_df):
    pages, _ = tiny_corpus
    got = {r.url: r.text for r in extract_text(tiny_pages_df).collect()}
    for _, row in pages.iterrows():
        assert got[row.url] == oracle_extract_text(bytes(row.html)) == row.text


def test_extraction_edge_cases(spark):
    rows = [
        ("u1", TS, b"<html><body></body></html>", "en"),
        ("u2", TS, b"no body tags", "en"),
        ("u3", TS, b"<html><body>a<body>nested</body>b</body></html>", "en"),
        ("u4", TS, b"</body><html><body>x", "en"),  # end before start, no close after
        ("u5", TS, "<html><body>café ☃</body></html>".encode(), "en"),
    ]
    df = spark.createDataFrame(rows, ["url", "warc_ts", "html", "lang"])
    got = {r.url: r.text for r in extract_text(df).collect()}
    for url, _, html, _ in rows:
        assert got[url] == oracle_extract_text(html), url
    assert got["u3"] == "a<body>nested</body>b"  # first <body> .. LAST </body>
    assert got["u2"] == ""
    assert got["u5"] == "café ☃"


def test_size_bytes_is_html_octet_length(spark):
    html = "<html><body>éé</body></html>".encode()
    df = spark.createDataFrame([("u", TS, html, "en")], ["url", "warc_ts", "html", "lang"])
    assert extract_text(df).collect()[0].size_bytes == len(html)
