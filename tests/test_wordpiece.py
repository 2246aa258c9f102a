"""E71 greedy maximal-munch subword counting: hand-derived munches,
UNK rule, and the Spark path vs the pure-python word rule."""

from __future__ import annotations

import pytest

from mediaduplicatefinder_spark.functions.wordpiece import (
    MAX_TOKEN_LEN,
    VOCAB,
    munch_word,
    wordpiece_token_stats,
)


def test_vocab_invariants():
    # single letters+digits present -> UNK only on non-alnum
    for c in "abcdefghijklmnopqrstuvwxyz0123456789":
        assert c in VOCAB
    assert MAX_TOKEN_LEN == max(len(v) for v in VOCAB)
    assert all(v == v.lower() for v in VOCAB)


def test_munch_is_longest_match_first():
    # "nation" -> longest prefix is "nd"? no: candidates n,na..,"nd" no —
    # vocab has no "nation"/"nat"/"na", so 'n' then "ation" (4-gram in
    # vocab beats a,at,ate chains)
    assert munch_word("nation") == (2, 0)
    # "the" is one unit
    assert munch_word("the") == (1, 0)
    # "theory": "the" + "or" + "y"
    assert munch_word("theory") == (3, 0)
    # pure UNK characters consume one at a time
    assert munch_word("!?") == (2, 2)
    # mixed: "it's" -> "it" + UNK(') + "s"
    assert munch_word("it's") == (3, 1)
    # empty word contributes nothing
    assert munch_word("") == (0, 0)


def test_spark_counts_match_python(spark):
    rows = [
        (1, "The nation was THEORY bound"),
        (2, "it's   spaced\tout\nlines"),
        (3, ""),
        (4, "   "),
        (5, "ingestion preprocessing 42"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(3)
    got = {
        r["doc_id"]: (r["n_words"], r["n_subwords"], r["n_unk"], r["tokens_per_word"])
        for r in wordpiece_token_stats(df).collect()
    }
    for doc_id, text in rows:
        words = text.strip().lower().split()
        t = u = 0
        for w in words:
            wt, wu = munch_word(w)
            t += wt
            u += wu
        tpw = round(t / len(words), 6) if words else 0.0
        assert got[doc_id] == (len(words), t, u, tpw)
    # zero-word docs carry zeros, not nulls
    assert got[3] == (0, 0, 0, 0.0) and got[4] == (0, 0, 0, 0.0)
