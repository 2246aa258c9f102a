"""HTML -> text extraction (S6-role, office_comparer_batch.py:12-25).

Arrow-batched mapInPandas (the reference's "batch the language boundary"
insight, main_cli.cpp:86-118, without the temp-file IPC). The per-row
invariant from BASELINE.json input_hint: byte-identical extracted text
per url vs the oracle (`oracle_extract_text`).

The synthetic corpus wraps text as
``<html><head>...</head><body>TEXT</body></html>``; extraction takes the
content between the FIRST ``<body>`` and the LAST ``</body>`` — both
sides implement exactly this contract.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EXTRACT_SCHEMA = (
    "url string, warc_ts timestamp, lang string, size_bytes long, text string"
)


def oracle_extract_text(html: bytes) -> str:
    """Golden single-doc spec (pytest layer-1 oracle)."""
    s = html.decode("utf-8", errors="replace")
    start = s.find("<body>")
    if start < 0:
        return ""
    end = s.rfind("</body>")
    if end < 0 or end < start:
        return ""
    return s[start + len("<body>") : end]


def extract_pdf(pdf: pd.DataFrame) -> pd.DataFrame:
    """One-batch extraction (shared by extract_text and the fused
    extract+signature pass in operators/signatures.py)."""
    s = pdf["html"].str.decode("utf-8", errors="replace")
    # first <body> ... last </body>; vectorized pandas str ops
    after = s.str.partition("<body>")[2]
    body = after.str.rpartition("</body>")[0]
    missing = ~(s.str.contains("<body>", regex=False) & s.str.contains("</body>", regex=False))
    body = body.mask(missing, "")
    return pd.DataFrame(
        {
            "url": pdf["url"],
            "warc_ts": pdf["warc_ts"],
            "lang": pdf["lang"],
            "size_bytes": pdf["html"].str.len().astype("int64"),
            "text": body,
        }
    )


def _extract_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        yield extract_pdf(pdf)


def extract_text(pages: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """pages(url, warc_ts, html, text?, lang) -> docs(url, warc_ts, lang,
    size_bytes, text). Only (url, warc_ts, html, lang) are read — column
    pruning keeps the scan narrow; ``size_bytes = octet_length(html)``
    (S3, main_cli.cpp:446).

    A single-file parquet scan arrives as one partition; pass
    ``min_partitions`` to spread the Arrow UDF across cores."""
    src = pages.select("url", "warc_ts", "html", "lang")
    # repartition only on a REAL deficit (tiny single-split inputs):
    # shuffling the full text to go from e.g. 28 to 32 partitions
    # costs more than the extra slots buy
    if min_partitions and src.rdd.getNumPartitions() < max(2, min_partitions // 2):
        src = src.repartition(min_partitions)
    return src.mapInPandas(_extract_batches, schema=EXTRACT_SCHEMA)


def extracted_or_given_text(
    pages: DataFrame, use_html: bool = True, min_partitions: int | None = None
) -> DataFrame:
    """When the input already carries a trustworthy ``text`` column the
    extraction UDF can be skipped (pure-column path)."""
    if use_html and "html" in pages.columns:
        return extract_text(pages, min_partitions)
    return pages.select(
        "url",
        "warc_ts",
        "lang",
        F.octet_length("text").cast("long").alias("size_bytes"),
        "text",
    )
