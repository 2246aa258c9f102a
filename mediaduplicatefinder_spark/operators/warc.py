"""WARC segment source (E38): parse Common-Crawl-style WARC containers
into the pipeline's page rows (url, warc_ts, html) — the S1/S4 "walk
the container, emit work items" role (main_cli.cpp:426-447 directory
scan) for the format webtext actually arrives in.

WARC (ISO 28500, public): a segment is a concatenation of records —

    WARC/1.0\\r\\n
    Header-Name: value\\r\\n ...
    \\r\\n
    <Content-Length payload bytes>\\r\\n\\r\\n

``response`` records carry an HTTP response as payload; the HTML body
starts after the HTTP head's ``\\r\\n\\r\\n``.  Parsing is driven by
``Content-Length`` — bodies may legally contain ``\\r\\n\\r\\n``, so
delimiter-splitting would corrupt them (pinned by test).

Spark shape: segments are opaque ``binary`` rows (the multimodal E8
pattern); one ``mapInPandas`` walks each segment's records in pure
Python — per-partition imperative parsing is exactly the case the
brief reserves Python for, and each segment parses independently so
the operator scales with the segment count.  Malformed tails
(truncated payload, bad Content-Length) SKIP the remainder of that
segment and emit a ``parse_error`` marker row instead of throwing —
a crawl batch must not die on one bad segment (the reference's
per-file error branch, duplicate_gui.py:841-856).

No SQL oracle (a binary container parser has no DuckDB twin) — the
correctness layer is a byte-level builder/parser round-trip plus
adversarial fixtures, the repo's S4/E17 pattern.
"""

from __future__ import annotations

import datetime as dt
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WARC_SCHEMA = (
    "segment_id string, url string, warc_ts timestamp, html binary, "
    "record_type string, parse_error string"
)


def build_warc_bytes(records: list[dict]) -> bytes:
    """Deterministic WARC/1.0 segment builder (tests + datagen).

    Each record dict: ``type`` ('response'/'request'/'warcinfo'),
    ``url``, ``ts`` (datetime), ``body`` (bytes; for responses the
    HTML — an HTTP/1.1 head is prepended here)."""
    out = bytearray()
    for r in records:
        if r["type"] == "response":
            payload = (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
                + r["body"]
            )
        else:
            payload = r["body"]
        ts = r["ts"].strftime("%Y-%m-%dT%H:%M:%SZ")
        head = (
            b"WARC/1.0\r\n"
            + f"WARC-Type: {r['type']}\r\n".encode()
            + f"WARC-Target-URI: {r['url']}\r\n".encode()
            + f"WARC-Date: {ts}\r\n".encode()
            + f"Content-Length: {len(payload)}\r\n".encode()
            + b"\r\n"
        )
        out += head + payload + b"\r\n\r\n"
    return bytes(out)


def _parse_segment(segment_id: str, data: bytes) -> list[dict]:
    rows = []
    i, n = 0, len(data)
    while i < n:
        if data[i : i + 5] != b"WARC/":
            rows.append(_err(segment_id, i, "bad magic"))
            break
        head_end = data.find(b"\r\n\r\n", i)
        if head_end < 0:
            rows.append(_err(segment_id, i, "truncated header"))
            break
        headers = {}
        for line in data[i:head_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower()] = v.strip()
        try:
            length = int(headers[b"content-length"])
        except (KeyError, ValueError):
            rows.append(_err(segment_id, i, "bad content-length"))
            break
        body_start = head_end + 4
        body_end = body_start + length
        if body_end + 4 > n:
            rows.append(_err(segment_id, i, "truncated payload"))
            break
        rtype = headers.get(b"warc-type", b"").decode("ascii", "replace")
        if rtype == "response":
            payload = data[body_start:body_end]
            http_end = payload.find(b"\r\n\r\n")
            html = payload[http_end + 4 :] if http_end >= 0 else b""
            try:
                ts = dt.datetime.strptime(
                    headers[b"warc-date"].decode("ascii"),
                    "%Y-%m-%dT%H:%M:%SZ",
                )
            except (KeyError, ValueError):
                ts = None
            rows.append(
                {
                    "segment_id": segment_id,
                    "url": headers.get(b"warc-target-uri", b"").decode(
                        "utf-8", "replace"
                    ),
                    "warc_ts": ts,
                    "html": html,
                    "record_type": rtype,
                    "parse_error": None,
                }
            )
        i = body_end + 4
    return rows


def _err(segment_id: str, offset: int, why: str) -> dict:
    return {
        "segment_id": segment_id,
        "url": None,
        "warc_ts": None,
        "html": None,
        "record_type": "error",
        "parse_error": f"@{offset}: {why}",
    }


def build_warc_gz(records: list[dict]) -> bytes:
    """Deterministic ``.warc.gz`` segment: ONE gzip member per record
    (the Common Crawl packaging convention — members are the seek
    points that make a 1 GB segment range-readable), fixed mtime so
    bytes are reproducible."""
    import gzip

    out = bytearray()
    for r in records:
        out += gzip.compress(build_warc_bytes([r]), compresslevel=6, mtime=0)
    return bytes(out)


def _parse_gz_segment(segment_id: str, data: bytes) -> list[dict]:
    """Walk concatenated gzip members; each member's bytes parse with
    the plain-WARC record walker. A corrupt member emits a marker row
    and stops the segment (same tail tolerance as _parse_segment)."""
    rows: list[dict] = []
    buf = data
    offset = 0
    while buf:
        if buf[:2] != b"\x1f\x8b":
            rows.append(_err(segment_id, offset, "bad gzip magic"))
            break
        obj = zlib.decompressobj(16 + zlib.MAX_WBITS)
        try:
            member = obj.decompress(buf)
            if not obj.eof:
                rows.append(_err(segment_id, offset, "truncated gzip member"))
                break
        except zlib.error:
            rows.append(_err(segment_id, offset, "corrupt gzip member"))
            break
        rows.extend(_parse_segment(segment_id, member))
        consumed = len(buf) - len(obj.unused_data)
        offset += consumed
        buf = obj.unused_data
    return rows


def parse_warc_gz(segments: DataFrame) -> DataFrame:
    """``.warc.gz`` twin of :func:`parse_warc` — same output schema,
    input ``data`` is concatenated per-record gzip members.  One
    ``mapInPandas`` task decompresses and walks each segment
    independently: the compressed bytes never shuffle, and segment
    count is the parallelism unit exactly as Common Crawl jobs run."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "segment_id", "url", "warc_ts", "html",
            "record_type", "parse_error",
        ]
        for pdf in batches:
            rows: list[dict] = []
            for sid, data in zip(pdf["segment_id"], pdf["data"]):
                rows.extend(_parse_gz_segment(sid, bytes(data)))
            yield pd.DataFrame(rows, columns=cols)

    return segments.select("segment_id", "data").mapInPandas(
        fn, schema=WARC_SCHEMA
    )


EXPORT_SCHEMA = (
    "segment_id string, data binary, n_records long, n_bytes long"
)


def export_warc(
    pages: DataFrame, segment_col: str = "segment_id", gz: bool = False
) -> DataFrame:
    """WARC sink (E151): pages(url, warc_ts timestamp, html binary,
    <segment_col>) -> one REAL WARC/1.0 segment per segment key:
    (segment_id, data binary, n_records, n_bytes). The inverse of
    ``parse_warc`` — a cleaned corpus leaves the engine in the same
    container format it arrived in (CDX-style re-publication of a
    deduped crawl).

    Determinism contract: records within a segment are serialized in
    (url, warc_ts) order, so identical inputs produce byte-identical
    segments at any parallelism — the segment bytes themselves are
    safe to value-compare. ``gz=True`` emits the per-record-gzip
    layout (``build_warc_gz``, the E123 second source layout).

    Scale shape: one shuffle on the segment key (the writer's natural
    unit of work), one Python serialization pass per segment —
    segments build independently, and html bytes cross the exchange
    exactly once (the sink IS the reason they move)."""
    builder = build_warc_gz if gz else build_warc_bytes

    def fn(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["url", "warc_ts"], kind="mergesort")
        recs = [
            {
                "type": "response",
                "url": u,
                "ts": t.to_pydatetime(),
                "body": bytes(h),
            }
            for u, t, h in zip(pdf["url"], pdf["warc_ts"], pdf["html"])
        ]
        data = builder(recs)
        return pd.DataFrame(
            {
                "segment_id": [str(key[0])],
                "data": [data],
                "n_records": [len(recs)],
                "n_bytes": [len(data)],
            }
        )

    return (
        pages.select(
            F.col(segment_col).cast("string").alias("__seg"),
            "url",
            "warc_ts",
            "html",
        )
        .groupBy("__seg")
        .applyInPandas(fn, EXPORT_SCHEMA)
    )


def parse_warc(segments: DataFrame) -> DataFrame:
    """segments(segment_id string, data binary) -> one row per
    ``response`` record (+ one marker row per malformed tail):
    (segment_id, url, warc_ts, html, record_type, parse_error).
    Feed ``.filter("parse_error IS NULL")`` rows (with a ``lang``
    column) straight into operators/extract.extract_text."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "segment_id", "url", "warc_ts", "html",
            "record_type", "parse_error",
        ]
        for pdf in batches:
            rows: list[dict] = []
            for sid, data in zip(pdf["segment_id"], pdf["data"]):
                rows.extend(_parse_segment(sid, bytes(data)))
            yield pd.DataFrame(rows, columns=cols)

    return segments.select("segment_id", "data").mapInPandas(
        fn, schema=WARC_SCHEMA
    )
