"""Content-sniffed document dispatch (E134): route an opaque binary
payload to the right extractor by magic bytes — the reference's
per-extension dispatcher (main_cli.cpp:426-447 routes on filename
suffix into stbi/docx/xlsx/pptx loaders) rebuilt the way a crawl
pipeline must do it: crawled payloads arrive under lying or absent
extensions, so the CONTENT decides (``PK`` zip -> OOXML part sniff,
``%PDF-`` -> PDF), and anything unrecognized degrades to an invalid
row, never an exception (duplicate_gui.py:841-856 tolerance).

One ``mapInPandas`` pass: payload bytes stay in the executor, only
(kind, text) leave. Composes the real extractors — operators/office.py
(docx/pptx) and operators/pdf.py — so this is the single entry point
turning a mixed crawl's document payloads into dedup-able text.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

ROUTED_SCHEMA = "doc_id long, doc_kind string, text string, valid boolean"


def route_document(data: bytes | None) -> tuple[str, str | None]:
    """(kind, text) for one payload; kind 'unknown' + None text when
    nothing claims the bytes."""
    from mediaduplicatefinder_spark.operators.office import (
        detect_office_kind,
        extract_docx_text,
        extract_pptx_text,
    )
    from mediaduplicatefinder_spark.operators.pdf import extract_pdf_text

    if not data:
        return "unknown", None
    if data[:5] == b"%PDF-":
        return "pdf", extract_pdf_text(data)
    kind = detect_office_kind(data)
    if kind == "docx":
        return kind, extract_docx_text(data)
    if kind == "pptx":
        return kind, extract_pptx_text(data)
    if kind == "xlsx":
        # cell relation, not flat text — callers use xlsx_cells; the
        # router only names it
        return kind, None
    return "unknown", None


def route_documents(df: DataFrame) -> DataFrame:
    """(doc_id, payload:binary) -> (doc_id, doc_kind, text, valid)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            kinds, texts = [], []
            for raw in pdf["payload"]:
                kind, text = route_document(
                    bytes(raw) if raw is not None else None
                )
                kinds.append(kind)
                texts.append(text)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "doc_kind": kinds,
                    "text": texts,
                    "valid": [t is not None for t in texts],
                }
            )

    return df.select("doc_id", "payload").mapInPandas(fn, ROUTED_SCHEMA)
