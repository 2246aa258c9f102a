"""E130 PDF text extraction (operators/pdf.py): writer/parser round
trips, spec-escape handling, per-file and per-stream tolerance, and the
xref table's byte-offset validity (a real PDF reader's entry point)."""

from __future__ import annotations

import re
import zlib

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mediaduplicatefinder_spark.operators.pdf import (
    extract_pdf_text,
    extract_pdf_text_df,
    make_pdf,
)


def test_roundtrip_basic():
    lines = ["hello world", "second line", "", "third"]
    assert extract_pdf_text(make_pdf(lines)) == "\n".join(lines)


def test_roundtrip_escapes_and_hex():
    lines = ["with (parens)", "back\\slash", "tab\there", "hex<mark>"]
    pdf = make_pdf(lines, hex_lines=frozenset({3}))
    assert extract_pdf_text(pdf) == "\n".join(lines)


def test_roundtrip_utf8():
    lines = ["café au lait", "中文 текст"]
    assert extract_pdf_text(make_pdf(lines)) == "\n".join(lines)


def test_empty_document():
    assert extract_pdf_text(make_pdf([])) == ""


def test_non_pdf_returns_none():
    assert extract_pdf_text(b"GIF89a not a pdf") is None
    assert extract_pdf_text(b"") is None


def test_truncated_stream_tolerated():
    pdf = make_pdf(["abc", "def"])
    # cut inside the content stream: no endstream -> stream skipped,
    # not a crash (per-stream tolerance)
    cut = pdf[: pdf.find(b"stream\n") + 20]
    assert extract_pdf_text(cut) == ""


def test_corrupt_deflate_skipped():
    pdf = make_pdf(["abc"])
    start = pdf.find(b"stream\n") + len(b"stream\n")
    broken = pdf[:start] + b"\x00\x00" + pdf[start + 2 :]
    assert extract_pdf_text(broken) == ""


def test_unknown_filter_skipped():
    pdf = make_pdf(["abc"]).replace(b"/FlateDecode", b"/DCTDecodeXX")
    assert extract_pdf_text(pdf) == ""


def test_uncompressed_stream_and_octal_and_continuation():
    # hand-written page with no /Filter, octal escapes, a split-string
    # backslash-newline continuation, and a TJ array with kerning
    content = (
        b"BT /F1 12 Tf 72 720 Td"
        b" (oct\\101l) Tj"  # \101 = 'A'
        b" 0 -14 Td [(arr) -250 (ay)] TJ"
        b" 0 -14 Td (con\\\ntinued) Tj"
        b" ET"
    )
    pdf = (
        b"%PDF-1.4\n1 0 obj\n<< /Length "
        + str(len(content)).encode()
        + b" >>\nstream\n"
        + content
        + b"\nendstream\nendobj\n"
    )
    assert extract_pdf_text(pdf) == "octAl\narray\ncontinued"


def test_quote_operators_break_line():
    content = b"BT (a) Tj (b) ' (c) \" ET"
    pdf = (
        b"%PDF-1.4\n1 0 obj\n<< /Length "
        + str(len(content)).encode()
        + b" >>\nstream\n"
        + content
        + b"\nendstream\nendobj\n"
    )
    assert extract_pdf_text(pdf) == "a\nb\nc"


def test_text_outside_bt_et_ignored():
    content = b"(stray) Tj BT (kept) Tj ET (stray2) Tj"
    pdf = (
        b"%PDF-1.4\n1 0 obj\n<< /Length "
        + str(len(content)).encode()
        + b" >>\nstream\n"
        + content
        + b"\nendstream\nendobj\n"
    )
    assert extract_pdf_text(pdf) == "kept"


def test_xref_offsets_are_exact():
    """Every xref entry must point at the 'N 0 obj' byte — what an
    external reader would seek to."""
    pdf = make_pdf(["line one", "line two"])
    m = re.search(rb"xref\n0 (\d+)\n(.*?)trailer", pdf, re.S)
    assert m
    entries = m.group(2).splitlines()
    assert entries[0].startswith(b"0000000000 65535 f")
    for n, entry in enumerate(entries[1:], start=1):
        off = int(entry[:10])
        assert pdf[off:].startswith(b"%d 0 obj" % n)
    startxref = int(re.search(rb"startxref\n(\d+)\n", pdf).group(1))
    assert pdf[startxref:].startswith(b"xref")


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(
                codec="utf-8", exclude_characters="\r\n"
            ),
            max_size=40,
        ),
        max_size=6,
    ),
    st.sets(st.integers(min_value=0, max_value=5), max_size=6),
)
def test_roundtrip_fuzz(lines, hexidx):
    pdf = make_pdf(lines, hex_lines=frozenset(hexidx))
    assert extract_pdf_text(pdf) == "\n".join(lines)


def test_deflate_body_ending_in_eol_byte():
    """Regression: a compressed body whose last byte is 0x0a/0x0d must
    not be trimmed by EOL-guessing (the /Length path)."""
    for filler in range(300):
        lines = [f"pad {filler} " + "x" * (filler % 17)]
        raw = zlib.compress(
            b"BT (" + lines[0].encode() + b") Tj ET", 6
        )
        if raw[-1:] in (b"\n", b"\r"):
            assert extract_pdf_text(make_pdf(lines)) == lines[0]
            return
    pytest.skip("no filler produced an EOL-final deflate body")


def test_spark_extract_df(spark):
    rows = [
        (1, make_pdf(["alpha beta", "gamma"])),
        (2, b"not a pdf"),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = {r.doc_id: r for r in extract_pdf_text_df(df).collect()}
    assert got[1].text == "alpha beta\ngamma" and got[1].valid
    assert got[2].text is None and not got[2].valid
    assert got[3].text is None and not got[3].valid
