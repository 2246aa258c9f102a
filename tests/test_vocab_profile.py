"""E86 Zipf/Heaps vocabulary profile (operators/stats.vocab_profile)."""

from __future__ import annotations

from mediaduplicatefinder_spark.operators.stats import vocab_profile


def _df(spark, rows):
    return spark.createDataFrame(rows, "source string, text string")


def test_hand_counts(spark):
    rows = [
        ("a", "the cat and the dog and the bird"),
        ("a", "one cat"),
        ("b", ""),
    ]
    got = {r.grp: r for r in vocab_profile(_df(spark, rows)).collect()}
    a = got["a"]
    # tokens: the x3, and x2, cat x2, dog, bird, one -> 10 tokens
    assert a.n_docs == 2 and a.n_tokens == 10
    assert a.vocab == 6 and a.hapax == 3
    assert a.top_term == "the" and a.top_cnt == 3
    assert a.top_share == round(3 / 10, 6)
    assert a.hapax_frac == round(3 / 6, 6)
    b = got["b"]
    assert (b.n_docs, b.n_tokens, b.vocab, b.hapax) == (1, 0, 0, 0)
    assert b.top_term is None and b.top_share is None


def test_tie_break_alphabetical(spark):
    rows = [("g", "zz aa zz aa")]
    r = vocab_profile(_df(spark, rows)).collect()[0]
    assert r.top_term == "aa" and r.top_cnt == 2


def test_case_and_punct_folding(spark):
    rows = [("g", "The THE the, the! 42 42")]
    r = vocab_profile(_df(spark, rows)).collect()[0]
    assert r.top_term == "the" and r.top_cnt == 4
    assert r.vocab == 2 and r.n_tokens == 6
