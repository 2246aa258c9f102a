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


def test_fused_page_signatures_match_two_step(spark, tiny_pages_df):
    """page_signatures (one fused extract+sha+sig pass) must be
    row-identical to the two-step JVM-sha formulation — same sha256
    (hashlib vs F.sha2), same signatures, same doc_key."""
    from pyspark.sql import functions as F

    from mediaduplicatefinder_spark.operators import exact as exact_ops
    from mediaduplicatefinder_spark.operators.extract import extracted_or_given_text
    from mediaduplicatefinder_spark.operators.signatures import (
        compute_signatures,
        page_signatures,
    )

    fused = page_signatures(tiny_pages_df, min_partitions=4, use_html=True)
    docs = extracted_or_given_text(tiny_pages_df, use_html=True, min_partitions=4)
    two_step = compute_signatures(
        exact_ops.with_sha256(docs),
        min_partitions=4,
        include_minhash=False,
        carry_sha256=True,
    )
    cols = sorted(fused.columns)
    assert cols == sorted(two_step.columns)
    a = sorted(map(tuple, fused.select(*cols).collect()))
    b = sorted(map(tuple, two_step.select(*cols).collect()))
    assert a == b


def test_fused_sha256_unicode_parity(spark):
    """hashlib sha256 over utf-8 == F.sha2(text.cast(binary)) even for
    non-ASCII text (the fused pass's grouping-key contract)."""
    from pyspark.sql import functions as F

    from mediaduplicatefinder_spark.operators.signatures import page_signatures

    rows = [("u1", "café ☃ δ"), ("u2", ""), ("u3", "plain ascii text here")]
    df = spark.createDataFrame(rows, ["url", "text"]).withColumn(
        "lang", F.lit("en")
    )
    got = {r.url: r.sha256 for r in page_signatures(df, use_html=False).collect()}
    want = {
        r.url: r.s
        for r in df.select(
            "url", F.sha2(F.col("text").cast("binary"), 256).alias("s")
        ).collect()
    }
    assert got == want
