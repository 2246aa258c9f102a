"""E82 mojibake repair (functions/mojibake.py)."""

from __future__ import annotations

from mediaduplicatefinder_spark.functions.mojibake import (
    MOJIBAKE_REPAIRS,
    repair_mojibake,
    repair_text,
)


def test_table_is_real_double_encoding():
    # every entry must be the codec round-trip of its target
    for moj, ch in MOJIBAKE_REPAIRS:
        assert moj == ch.encode("utf-8").decode("cp1252")
        assert len(ch) == 1 and len(moj) in (2, 3)
    # longest-first ordering
    lens = [len(m) for m, _ in MOJIBAKE_REPAIRS]
    assert lens == sorted(lens, reverse=True)
    # the canonical victims are covered
    targets = {ch for _, ch in MOJIBAKE_REPAIRS}
    assert {"é", "’", "€", "ü", "ñ", "…", "—", "\xa0"} <= targets


def test_repair_roundtrip():
    clean = "Café ’quoted’ naïve – dash… €5 ©ok ü ñ"
    moj = clean.encode("utf-8").decode("cp1252")
    assert moj != clean
    assert repair_text(moj) == clean
    # plain ascii untouched
    assert repair_text("hello world 123") == "hello world 123"


def test_spark_matches_python(spark):
    texts = [
        "plain ascii only",
        "Café ’x’".encode("utf-8").decode("cp1252"),
        "naïve – …".encode("utf-8").decode("cp1252"),
        "",
        "already clean é ü ñ",  # single-encoded: must NOT change
    ]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in repair_mojibake(df).collect()}
    for i, t in enumerate(texts):
        fixed = repair_text(t)
        assert rows[i].fixed_text == fixed, (i, t)
        assert rows[i].chars_repaired == len(t) - len(fixed)
        assert rows[i].had_mojibake == (len(t) != len(fixed))
    assert rows[4].fixed_text == texts[4]  # no false repair
