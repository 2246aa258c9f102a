"""E69 onion cross-document duplicated n-gram ratio: independent
python replay + planted cases (mosaic duplication that NO pairwise
channel flags, short-doc zero-gram rows, within-doc-only repetition
NOT counted, threshold boundary, partition invariance)."""

from __future__ import annotations

from collections import Counter

import pytest

from mediaduplicatefinder_spark.operators.onion import (
    DEFAULT_N,
    onion_dup_ratio,
)

N = 3  # small n so hand-built docs stay readable


def _ref(docs: dict[int, str], n: int = N):
    grams = {
        d: [
            " ".join(toks[i : i + n])
            for toks in [[t for t in s.strip().split()] or [""]]
            for i in range(len(toks) - n + 1)
        ]
        for d, s in docs.items()
    }
    # NOTE trim/split parity: ''.strip().split() == [] but the engine's
    # split(trim, \s+) of '' is [''] — both yield zero n-grams for n>1
    docfreq = Counter()
    for d, gs in grams.items():
        for g in set(gs):
            docfreq[g] += 1
    out = {}
    for d, gs in grams.items():
        n_grams = len(gs)
        n_dup = sum(1 for g in gs if docfreq[g] >= 2)
        frac = round(n_dup / n_grams, 6) if n_grams else 0.0
        out[d] = (n_grams, n_dup, frac, 2 * n_dup <= n_grams)
    return out


def _run(spark, docs: dict[int, str], parts: int = 4):
    df = spark.createDataFrame(
        [(d, s) for d, s in docs.items()], "doc_id long, text string"
    ).repartition(parts)
    rows = onion_dup_ratio(df, n=N).collect()
    return {
        r["doc_id"]: (r["n_grams"], r["n_dup_grams"], r["dup_frac"], r["kept"])
        for r in rows
    }


def test_matches_python_replay(spark):
    docs = {
        1: "alpha beta gamma delta epsilon zeta",
        2: "alpha beta gamma something else entirely here",
        3: "unique words only in this document exist",
        4: "alpha beta gamma delta epsilon zeta",  # exact copy of 1
        5: "xx",  # shorter than n -> zero grams, kept
        6: "",  # empty -> zero grams, kept
    }
    assert _run(spark, docs) == _ref(docs)


def test_mosaic_duplication_flagged(spark):
    """A document stitched from fragments of OTHER documents exceeds
    the threshold even though it equals none of them — the signal the
    pairwise channels cannot produce."""
    docs = {
        1: "the quick brown fox jumps over the lazy dog",
        2: "pack my box with five dozen liquor jugs",
        3: "the quick brown fox pack my box with five",  # mosaic of 1+2
    }
    got = _run(spark, docs)
    assert got == _ref(docs)
    n_grams, n_dup, frac, kept = got[3]
    assert n_dup > 0 and not kept


def test_within_doc_repetition_not_counted(spark):
    """Order-free rule: duplicated means >= 2 DISTINCT documents; a
    gram repeated only inside one doc contributes c to n_grams but 0
    to n_dup_grams (within-doc repetition is E22/E42's signal)."""
    docs = {1: "spam ham eggs spam ham eggs spam ham eggs", 2: "totally different words here now"}
    got = _run(spark, docs)
    assert got == _ref(docs)
    assert got[1][1] == 0 and got[1][3]


def test_threshold_boundary(spark):
    """kept is <= (not <): exactly half duplicated stays."""
    docs = {
        # doc 3 has 4 grams ("a b c","b c d","c d z","d z y") of which
        # exactly the first 2 occur in doc 1
        1: "a b c d e",
        3: "a b c d z y",
    }
    got = _run(spark, docs)
    assert got == _ref(docs)
    n_grams, n_dup, frac, kept = got[3]
    assert (n_grams, n_dup) == (4, 2) and kept


def test_partition_invariance(spark):
    docs = {
        i: f"w{i} common phrase tail {'shared suffix text body' if i % 2 else 'solo'}"
        for i in range(40)
    }
    assert _run(spark, docs, parts=1) == _run(spark, docs, parts=7)


def test_default_n_is_published():
    assert DEFAULT_N == 5
