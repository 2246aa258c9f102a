"""Unigram-LM Viterbi segmentation (functions/unigram.py, E163)."""

from __future__ import annotations

from mediaduplicatefinder_spark.functions.unigram import (
    MAX_PIECE,
    unigram_vocab,
    with_viterbi,
)


def _norm(text: str, max_len: int = 240) -> str:
    import re

    t = re.sub(r"[^a-z0-9 \t\n\r\f]", "", text.lower())
    return re.sub(r"\s+", " ", t).strip()[:max_len]


def _ref(text: str) -> tuple[int, int, str]:
    """Python Viterbi with the pinned tie rule (ascending j, strict >)."""
    vocab = unigram_vocab()
    t = _norm(text)
    n = len(t)
    best = [0] * (n + 1)
    bj = [0] * (n + 1)
    for i in range(1, n + 1):
        bs, bjj = None, 0
        for j in range(1, min(MAX_PIECE, i) + 1):
            piece = t[i - j : i]
            if piece in vocab:
                cand = best[i - j] + vocab[piece]
                if bs is None or cand > bs:
                    bs, bjj = cand, j
        best[i], bj[i] = bs, bjj
    pieces = []
    pos = n
    while pos > 0:
        j = bj[pos]
        pieces.append(t[pos - j : pos])
        pos -= j
    pieces.reverse()
    return len(pieces), best[n], "|".join(pieces)


TEXTS = [
    "The quick brown things!! with nothing",
    "",
    "   ",
    "aaa the the the",
    "internationalization of the translation mentation",
    "x",
    "123 456 and counting ever higher",
    "THIS IS SHOUTING WITH PUNCTUATION?!?!",
    "could would should ought and thought",
]


def test_matches_python_reference(spark):
    df = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_pieces, r.total_score, r.seg)
        for r in with_viterbi(df).select(
            "doc_id", "n_pieces", "total_score", "seg"
        ).collect()
    }
    for i, text in enumerate(TEXTS):
        assert got[i] == _ref(text), (i, text, got[i], _ref(text))


def test_segmentation_covers_text_and_is_optimal(spark):
    df = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string"
    )
    vocab = unigram_vocab()
    rows = with_viterbi(df).collect()
    for r in rows:
        t = _norm(TEXTS[r.doc_id])
        pieces = r.seg.split("|") if r.seg else []
        assert "".join(pieces) == t  # lossless cover
        assert sum(vocab[p] for p in pieces) == (r.total_score or 0)
        # optimal >= all-singles baseline, strictly better when a
        # multi-char piece applies
        if t:
            assert r.total_score >= len(t) * -100
        if "the" in t:
            assert r.total_score > len(t) * -100


def test_partition_invariance(spark):
    df = spark.createDataFrame(
        [(i, TEXTS[i % len(TEXTS)] + f" tail {i}") for i in range(20)],
        "doc_id long, text string",
    )
    outs = [
        {
            r.doc_id: (r.n_pieces, r.total_score, r.seg)
            for r in with_viterbi(df.repartition(p)).select(
                "doc_id", "n_pieces", "total_score", "seg"
            ).collect()
        }
        for p in (1, 7)
    ]
    assert outs[0] == outs[1]
