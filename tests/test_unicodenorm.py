"""Unicode NFC normalization (functions/unicodenorm.py, E52)."""

from __future__ import annotations

import unicodedata

from mediaduplicatefinder_spark.functions.unicodenorm import nfc_normalize


def test_nfc_cases(spark):
    rows = [
        (1, "plain ascii stays put"),
        (2, "café"),             # decomposed -> café
        (3, "Ångström"),     # composed: no-op
        (4, "Ångström"),   # decomposed -> Ångström
        (5, "각"),     # jamo -> 각
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = {r.doc_id: r for r in nfc_normalize(df).collect()}
    for i, text in [(k, t) for k, t in rows if t is not None]:
        want = unicodedata.normalize("NFC", text)
        assert got[i].text_nfc == want
        assert got[i].changed == (want != text)
    assert not got[1].changed
    assert got[2].text_nfc == "café" and got[2].changed
    assert got[4].text_nfc == "Ångström"
    assert got[5].text_nfc == "각"
    assert got[5].n_chars_before == 3 and got[5].n_chars_after == 1
    assert got[6].text_nfc is None


def test_idempotent(spark):
    df = spark.createDataFrame(
        [(1, "Å é 가")], "doc_id: long, text: string"
    )
    once = nfc_normalize(df).select("doc_id", "text_nfc")
    twice = nfc_normalize(once, text_col="text_nfc", out_col="t2").collect()[0]
    assert twice.t2 == twice.text_nfc and not twice.changed


def test_nfc_fused_into_signature_pass(spark):
    """cfg.nfc_normalize fuses canonicalization into page_signatures:
    byte-different but canonically-equal pages share sha256 (one exact
    cluster) with the flag on, and stay distinct with it off."""
    from mediaduplicatefinder_spark.config import DEFAULT_CONFIG, EngineConfig
    from mediaduplicatefinder_spark.operators.signatures import (
        page_signatures,
    )

    composed = "café menu " * 20
    decomposed = "café menu " * 20
    assert composed != decomposed
    df = spark.createDataFrame(
        [("u1", "en", composed), ("u2", "en", decomposed)],
        "url: string, lang: string, text: string",
    )
    off = {r.url: r.sha256 for r in page_signatures(
        df, DEFAULT_CONFIG, use_html=False).collect()}
    assert off["u1"] != off["u2"]
    on_rows = page_signatures(
        df, EngineConfig(nfc_normalize=True), use_html=False
    ).collect()
    on = {r.url: r for r in on_rows}
    assert on["u1"].sha256 == on["u2"].sha256
    # canonical bytes drive size too
    assert on["u1"].size_bytes == on["u2"].size_bytes
