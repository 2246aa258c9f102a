"""Mojibake repair — UTF-8-read-as-CP1252 double encoding (E82).

The single most common webtext encoding defect: a page's UTF-8 bytes
were decoded as CP1252 somewhere upstream, so ``é`` (0xC3 0xA9)
surfaces as ``Ã©`` and ``’`` (0xE2 0x80 0x99) as ``â€™``.  ftfy's
core fix, reduced to its deterministic heart: a repair table built by
ROUND-TRIPPING every Latin-1-supplement codepoint (U+00A0..U+00FF) and
the common punctuation block through ``utf-8 -> cp1252`` at import
time — the table is derived from the real codecs, not hand-typed, and
both engines consume the SAME Python-built list as literal
``replace`` chains (longest patterns first, one sequential pass; byte
positions CP1252 leaves undefined are skipped exactly as the codec
rejects them).

Map-only column expression — a nested ``replace`` chain stays inside
whole-stage codegen; no UDF, no shuffle.  ``chars_repaired`` =
``length(text) - length(fixed)`` (every 2->1 repair shrinks by one,
3->1 by two) is the integer evidence column.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PUNCT = "’‘“”„–—…€™•‹›ƒˆ˜ŠšŽžŒœŸ"


def _build_repairs() -> list[tuple[str, str]]:
    out: dict[str, str] = {}
    for ch in _PUNCT:
        try:
            moj = ch.encode("utf-8").decode("cp1252")
        except UnicodeDecodeError:
            continue
        out[moj] = ch
    for c in range(0xA0, 0x100):
        ch = chr(c)
        try:
            moj = ch.encode("utf-8").decode("cp1252")
        except UnicodeDecodeError:
            continue
        out[moj] = ch
    # longest mojibake first, then codepoint order: one deterministic
    # sequential pass, identical in both engines
    return sorted(out.items(), key=lambda kv: (-len(kv[0]), kv[1]))


MOJIBAKE_REPAIRS = _build_repairs()


def repair_text(text: str) -> str:
    """Pure-Python replay of the exact chain (tests)."""
    for moj, ch in MOJIBAKE_REPAIRS:
        text = text.replace(moj, ch)
    return text


def repair_mojibake(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """docs(doc_id, text) ->
    (doc_id, fixed_text, chars_repaired, had_mojibake)."""
    d = docs.select("doc_id", F.col(text_col).alias("t"))
    fixed = reduce(
        lambda col, kv: F.replace(col, F.lit(kv[0]), F.lit(kv[1])),
        MOJIBAKE_REPAIRS,
        F.col("t"),
    )
    d = d.select("doc_id", "t", fixed.alias("fixed_text"))
    rep = (F.length("t") - F.length("fixed_text")).cast("long")
    return d.select(
        "doc_id",
        "fixed_text",
        rep.alias("chars_repaired"),
        (rep > 0).alias("had_mojibake"),
    )


def repair_mojibake_sql(
    docs_sql: str = "SELECT doc_id, text FROM documents",
) -> str:
    expr = "text"
    for moj, ch in MOJIBAKE_REPAIRS:
        expr = f"replace({expr}, '{moj}', '{ch}')"
    return f"""
WITH mdocs AS ({docs_sql}),
fx AS (SELECT doc_id, text, {expr} AS fixed_text FROM mdocs)
SELECT doc_id, fixed_text,
       (length(text) - length(fixed_text))::BIGINT AS chars_repaired,
       (length(text) - length(fixed_text)) > 0 AS had_mojibake
FROM fx
"""
