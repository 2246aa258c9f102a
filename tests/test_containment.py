"""E80 shingle containment pairs (operators/containment.py)."""

from __future__ import annotations

import pytest

from mediaduplicatefinder_spark.operators.containment import (
    shingle_containment_pairs,
)


def _df(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


def _words(n, seed=0):
    return " ".join(f"w{(i * 7 + seed) % 997}x{i}" for i in range(n))


def test_subset_detection(spark):
    big = _words(60)
    quote = " ".join(big.split()[10:30])  # contiguous 20-token excerpt
    other = _words(60, seed=500)
    rows = shingle_containment_pairs(
        _df(spark, [big, quote, other])
    ).collect()
    pairs = {(r.doc_a, r.doc_b): r for r in rows}
    assert (0, 1) in pairs
    r = pairs[(0, 1)]
    # every shingle of the quote appears in the big doc
    assert r.cont_b == 1.0 and r.inter == r.n_b
    # but resemblance is low: the asymmetric channel's whole point
    assert r.inter / (r.n_a + r.n_b - r.inter) < 0.5
    # unrelated doc pairs nothing
    assert not any(2 in p for p in pairs)


def test_jaccard_blind_spot_vs_containment(spark):
    # interleaved reuse: quote tokens scattered inside filler -> the
    # suffix/substring channels would miss it, SET containment must not
    base = _words(30).split()
    quote = " ".join(base[:24])
    host = []
    for i, w in enumerate(base[:24]):
        host.append(w)
    host_text = " ".join(host + _words(40, seed=700).split())
    rows = shingle_containment_pairs(_df(spark, [host_text, quote])).collect()
    r = {(x.doc_a, x.doc_b): x for x in rows}[(0, 1)]
    assert r.cont_b == 1.0


def test_threshold_and_symmetry_columns(spark):
    a = _words(40)
    b = " ".join(a.split()[:20]) + " " + _words(20, seed=321)
    rows = shingle_containment_pairs(_df(spark, [a, b])).collect()
    if rows:
        r = rows[0]
        assert r.cont_a == pytest.approx(r.inter / r.n_a, abs=1e-9)
        assert r.cont_b == pytest.approx(r.inter / r.n_b, abs=1e-9)
        assert max(r.cont_a, r.cont_b) >= 0.5


def test_stop_shingle_cap(spark):
    # one shingle shared by 100 docs, cap 64: it must not create pairs
    common = "alpha beta gamma delta epsilon"
    texts = [f"{common} unique{i} t{i} u{i} v{i} w{i}" for i in range(100)]
    rows = shingle_containment_pairs(_df(spark, texts)).collect()
    assert rows == []


def test_short_docs_skipped(spark):
    rows = shingle_containment_pairs(
        _df(spark, ["one two three four", "one two three four"])
    ).collect()
    assert rows == []  # fewer than k=5 tokens -> no shingles
