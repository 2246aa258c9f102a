"""E109 magic-byte type sniffing (functions/magic.py)."""

from __future__ import annotations

from mediaduplicatefinder_spark.functions.magic import magic_sniff

CASES = [
    (1, "http://h/a.png", bytes.fromhex("89504E470D0A1A0A") + b"x", "png", True),
    (2, "http://h/a.jpg", bytes.fromhex("FFD8FFE0") + b"JFIF", "jpeg", True),
    (3, "http://h/a.jpeg", bytes.fromhex("FFD8FFDB"), "jpeg", True),
    (4, "http://h/a.gif", b"GIF89a;", "gif", True),
    (5, "http://h/a.bmp", b"BM\x3a\x00", "bmp", True),
    (6, "http://h/a.wav", b"RIFF\x10\x00\x00\x00WAVEfmt ", "wav", True),
    (7, "http://h/a.gz", bytes.fromhex("1F8B0800"), "gzip", True),
    (8, "http://h/a.pdf", b"%PDF-1.7", "pdf", True),
    (9, "http://h/a.docx", b"PK\x03\x04\x14", "zip", True),
    (10, "http://h/a.html", b"<html><body>", "unknown", False),
    # lies: png bytes behind .txt
    (11, "http://h/a.txt", bytes.fromhex("89504E470D0A1A0A"), "png", False),
    # RIFF without WAVE (e.g. AVI) must NOT classify as wav
    (12, "http://h/a.wav", b"RIFF\x10\x00\x00\x00AVI LIST", "unknown", False),
    # extensionless url
    (13, "http://h/download", bytes.fromhex("1F8B0800"), "gzip", False),
]


def test_magic_matrix(spark):
    df = spark.createDataFrame(
        [(i, u, r) for i, u, r, _, _ in CASES],
        "doc_id long, url string, raw binary",
    )
    got = {r.doc_id: r for r in magic_sniff(df).collect()}
    for i, _, _, want_type, want_match in CASES:
        assert got[i].magic_type == want_type, (i, got[i])
        assert got[i].ext_matches == want_match, (i, got[i])
    assert got[13].url_ext == ""
