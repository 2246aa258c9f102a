"""E105 charset sniffing (functions/charset.py)."""

from __future__ import annotations

from mediaduplicatefinder_spark.functions.charset import sniff_charset

UTF8_BOM = bytes([0xEF, 0xBB, 0xBF])


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, raw binary")
    return {r.doc_id: r for r in sniff_charset(df).collect()}


def test_bom_detection_and_priority(spark):
    got = _run(
        spark,
        [
            # BOM wins even over a contradicting meta declaration
            (1, UTF8_BOM + b'<meta charset="latin1">'),
            (2, bytes([0xFF, 0xFE]) + b"ascii tail"),
            (3, bytes([0xFE, 0xFF]) + b"ascii tail"),
        ],
    )
    r1 = got[1]
    assert (r1.bom, r1.declared, r1.effective) == (
        "utf-8-bom",
        "windows-1252",
        "utf-8",
    )
    assert (got[2].bom, got[2].effective) == ("utf-16le", "utf-16le")
    assert (got[3].bom, got[3].effective) == ("utf-16be", "utf-16be")


def test_meta_declaration_forms(spark):
    got = _run(
        spark,
        [
            (1, b'<meta charset="UTF-8">'),
            (2, b'<meta http-equiv="Content-Type" content="text/html; charset=ISO-8859-1">'),
            (3, b'<meta charset="Shift_JIS">'),
        ],
    )
    assert got[1].declared == "utf-8" and got[1].effective == "utf-8"
    assert got[2].declared == "windows-1252"
    assert got[3].declared == "shift_jis"  # unknown labels pass lowercased


def test_whatwg_cp1252_aliases(spark):
    rows = [
        (i, f'<meta charset="{lbl}">'.encode())
        for i, lbl in enumerate(["latin1", "ISO-8859-1", "ascii", "cp1252"])
    ]
    got = _run(spark, rows)
    assert all(r.declared == "windows-1252" for r in got.values())


def test_default_when_undeclared(spark):
    got = _run(spark, [(1, b"<html>nothing declared</html>"), (2, b"")])
    for r in got.values():
        assert (r.bom, r.declared, r.effective) == (None, None, "utf-8")
