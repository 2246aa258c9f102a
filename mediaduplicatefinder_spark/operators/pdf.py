"""Real PDF text extraction — stdlib only (E130).

The reference's directory walk feeds every file through a
per-extension dispatcher (main_cli.cpp:426-447) with a per-file
try/except tolerance branch (duplicate_gui.py:841-856); its document
channel stops at OOXML.  Web crawls, however, are full of
``application/pdf`` payloads (the repo's own magic/table already
sniffs ``%PDF``), so the document-extraction surface grows a PDF
channel built the same way the OOXML one was (operators/office.py):
a from-scratch parser of the PUBLIC format spec (PDF 1.4, ISO 32000 /
Adobe PDF Reference) over stdlib ``zlib`` — no third-party libs, no
reference code.

Extraction semantics (deterministic, documented, oracle-checked):

- Every ``stream`` object whose dictionary names no filter or only
  ``/FlateDecode`` is decoded (``zlib``); other filters (DCTDecode,
  LZWDecode, ...) are skipped — per-stream tolerance, like the
  reference's per-file branch.
- Content streams are tokenized for text-show operators between
  ``BT``/``ET``: ``(literal) Tj``, ``' ``, ``" `` and ``[...] TJ``
  (array numbers are kerning — ignored).  Literal strings honour the
  spec's escapes (``\\n \\r \\t \\b \\f \\( \\) \\\\``, octal
  ``\\ddd``, and backslash-newline continuation); hex strings
  ``<...>`` decode per spec (odd final digit padded with 0).
- A text-positioning operator (``Td``/``TD``/``T*``) occurring after
  at least one show op on the current line starts a new output line;
  show strings within a line concatenate.  Lines join with ``\\n``.
  String bytes decode as UTF-8 (errors='replace') — a simplification
  of PDFDocEncoding/UTF-16BE documented here because the writer below
  emits UTF-8; real-world non-UTF-8 strings degrade, they never throw.
- Any structural failure returns ``None`` (per-file tolerance).

``make_pdf`` writes a minimal, deterministic, spec-valid PDF 1.4
(correct xref byte offsets, Flate-compressed content stream at a fixed
zlib level) — used by datagen, the ``pdf_text_roundtrip`` oracle
query, and tests; every other reader of these files (e.g. ``qpdf``)
would see a well-formed document.

Spark surface: ``extract_pdf_text_df`` is an Arrow-batched
``mapInPandas`` operator — binary payloads never leave the executor,
only extracted text shuffles (the multimodal E8 pattern).
"""

from __future__ import annotations

import re
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

PDF_TEXT_SCHEMA = "doc_id long, text string, valid boolean"

# ------------------------------------------------------------- writer

_ESC = {ord("\\"): "\\\\", ord("("): "\\(", ord(")"): "\\)",
        10: "\\n", 13: "\\r", 9: "\\t", 8: "\\b", 12: "\\f"}


def _lit(s: str) -> bytes:
    """PDF literal string for UTF-8 text, spec escapes applied."""
    return ("(" + "".join(_ESC.get(ord(c), c) for c in s) + ")").encode(
        "utf-8"
    )


def _hexstr(s: str) -> bytes:
    return b"<" + s.encode("utf-8").hex().encode("ascii") + b">"


def make_pdf(lines: list[str], hex_lines: frozenset[int] = frozenset()) -> bytes:
    """Minimal deterministic PDF 1.4: one Helvetica page, one
    Flate-compressed content stream, one ``Td``+``Tj`` per line (line
    indexes in ``hex_lines`` are written as hex strings to exercise
    that decode path)."""
    ops = [b"BT", b"/F1 12 Tf", b"72 720 Td"]
    for i, line in enumerate(lines):
        if i:
            ops.append(b"0 -14 Td")
        shown = _hexstr(line) if i in hex_lines else _lit(line)
        ops.append(shown + b" Tj")
    ops.append(b"ET")
    content = zlib.compress(b"\n".join(ops), 6)

    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >>",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        b"<< /Length %d /Filter /FlateDecode >>\nstream\n" % len(content)
        + content
        + b"\nendstream",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for n, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % n + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_at)
    )
    return bytes(out)


# ------------------------------------------------------------- reader

_STREAM_RE = re.compile(rb"<<(.*?)>>\s*stream(?:\r\n|\n)", re.S)
_OCTAL = b"01234567"


def _content_streams(data: bytes) -> list[bytes]:
    """Decoded bytes of every stream with no filter or /FlateDecode;
    other filters / corrupt deflate are skipped (per-stream
    tolerance)."""
    out = []
    for m in _STREAM_RE.finditer(data):
        d = m.group(1)
        start = m.end()
        end = data.find(b"endstream", start)
        if end < 0:
            continue
        # A direct /Length bounds the body exactly (spec 7.3.8.2) —
        # never trim bytes off a compressed body by EOL-guessing: the
        # deflate stream may itself end in 0x0a/0x0d.
        lm = re.search(rb"/Length\s+(\d+)(?![\d\s]*R)", d)
        if lm and start + int(lm.group(1)) <= end:
            body = data[start : start + int(lm.group(1))]
        else:
            body = data[start:end]
            if body.endswith(b"\r\n"):
                body = body[:-2]
            elif body.endswith(b"\n"):
                body = body[:-1]
        if b"/Filter" in d:
            if b"/FlateDecode" not in d:
                continue
            try:
                body = zlib.decompress(body)
            except zlib.error:
                continue
        out.append(body)
    return out


def _parse_literal(s: bytes, i: int) -> tuple[bytes, int]:
    """Parse from s[i] == '(' per spec 7.3.4.2; returns (bytes, next)."""
    assert s[i : i + 1] == b"("
    i += 1
    depth, out = 1, bytearray()
    n = len(s)
    while i < n:
        c = s[i : i + 1]
        if c == b"\\":
            nxt = s[i + 1 : i + 2]
            if nxt in (b"\n", b"\r"):  # line continuation
                i += 2
                if nxt == b"\r" and s[i : i + 1] == b"\n":
                    i += 1
                continue
            if nxt in _OCTAL and nxt != b"":
                j = i + 1
                while j < min(i + 4, n) and s[j : j + 1] in b"01234567":
                    j += 1
                out.append(int(s[i + 1 : j], 8) & 0xFF)
                i = j
                continue
            out += {
                b"n": b"\n", b"r": b"\r", b"t": b"\t",
                b"b": b"\b", b"f": b"\f",
            }.get(nxt, nxt)
            i += 2
            continue
        if c == b"(":
            depth += 1
        elif c == b")":
            depth -= 1
            if depth == 0:
                return bytes(out), i + 1
        out += c
        i += 1
    raise ValueError("unterminated literal string")


def _parse_hex(s: bytes, i: int) -> tuple[bytes, int]:
    end = s.find(b">", i)
    if end < 0:
        raise ValueError("unterminated hex string")
    digits = re.sub(rb"\s", b"", s[i + 1 : end])
    if len(digits) % 2:
        digits += b"0"
    return bytes.fromhex(digits.decode("ascii")), end + 1


_TOKEN_RE = re.compile(rb"[^\s()<>\[\]/]+|.", re.S)


def _extract_stream_text(s: bytes) -> list[str]:
    """Lines of text shown by one content stream (see module doc)."""
    lines: list[str] = []
    cur: list[str] = []
    shown_on_line = False
    in_text = False
    pending: list[bytes] = []  # strings seen since last operator
    i, n = 0, len(s)
    while i < n:
        c = s[i : i + 1]
        if c.isspace():
            i += 1
            continue
        if c == b"(":
            raw, i = _parse_literal(s, i)
            pending.append(raw)
            continue
        if c == b"<" and s[i + 1 : i + 2] != b"<":
            raw, i = _parse_hex(s, i)
            pending.append(raw)
            continue
        if c == b"<":  # dict <<
            i += 2
            continue
        if c in (b"[", b"]", b"/"):
            if c == b"/":  # name token: skip it wholly
                m = _TOKEN_RE.match(s, i + 1)
                i = m.end() if m and m.group()[:1] not in b"()<>[]/" else i + 1
                continue
            i += 1
            continue
        m = _TOKEN_RE.match(s, i)
        tok = m.group()
        i = m.end()
        if tok == b"BT":
            in_text, shown_on_line = True, False
            pending = []
        elif tok == b"ET":
            in_text = False
            pending = []
        elif not in_text:
            pending = []
        elif tok in (b"Td", b"TD", b"T*"):
            if shown_on_line:
                lines.append("".join(cur))
                cur, shown_on_line = [], False
            pending = []
        elif tok in (b"Tj", b"TJ", b"'", b'"'):
            if tok in (b"'", b'"') and shown_on_line:
                # ' and " are T* + show (spec Table 107): new line first
                lines.append("".join(cur))
                cur, shown_on_line = [], False
            for raw in pending:
                cur.append(raw.decode("utf-8", "replace"))
                shown_on_line = True
            pending = []
        elif not re.fullmatch(rb"[+-]?[0-9.]+", tok):
            # numbers are operands (TJ kerning, Td coords) — they must
            # not clear strings queued for the operator that follows
            pending = []
    if shown_on_line:
        lines.append("".join(cur))
    return lines


def extract_pdf_text(data: bytes) -> str | None:
    """Full-document extraction; None on any structural failure."""
    try:
        if not data.startswith(b"%PDF-"):
            return None
        lines: list[str] = []
        for stream in _content_streams(data):
            lines.extend(_extract_stream_text(stream))
        return "\n".join(lines)
    except Exception:
        return None


# ------------------------------------------------------------- Spark


def extract_pdf_text_df(df: DataFrame) -> DataFrame:
    """(doc_id, payload:binary) -> (doc_id, text, valid); valid=false
    (text NULL) on non-PDF / structurally broken payloads."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            texts = []
            for raw in pdf["payload"]:
                texts.append(
                    extract_pdf_text(bytes(raw)) if raw is not None else None
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "text": texts,
                    "valid": [t is not None for t in texts],
                }
            )

    return df.select("doc_id", "payload").mapInPandas(fn, PDF_TEXT_SCHEMA)
