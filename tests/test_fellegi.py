"""E186 Fellegi-Sunter: EM fit behavior on planted two-class data
(m/u separate, matches score above non-matches), pattern mechanics,
monotonicity of the Bayes factor in agreements, degenerate inputs,
and partition invariance."""

from __future__ import annotations

import pytest

from mediaduplicatefinder_spark.operators.fellegi import (
    fellegi_sunter,
    fit_em,
    pattern_scores,
)


def _docs(spark, rows, parts=4):
    return spark.createDataFrame(
        rows, "doc_id long, lang string, text string, n_chars long, "
        "source string"
    ).repartition(parts)


def test_em_separates_planted_mixture():
    # planted: 100 matches agree on ~all fields, 900 unmatches on few
    counts = {
        "1111": 80,
        "1110": 15,
        "1011": 5,
        "0000": 700,
        "0001": 120,
        "0100": 80,
    }
    lam, m, u = fit_em(counts)
    assert 0.05 < lam < 0.2  # ~10% match prevalence recovered
    # every m_k above its u_k: agreements are evidence FOR a match
    assert all(mk > uk for mk, uk in zip(m, u))
    assert m[0] > 0.8 and u[0] < 0.2


def test_bayes_factor_monotone_in_agreements():
    counts = {
        "1111": 50,
        "1100": 30,
        "0000": 800,
        "0011": 60,
        "0111": 40,
        "1000": 20,
    }
    scores = {p: bf for p, bf, _post in pattern_scores(counts)}
    # adding an agreement on any field multiplies by m/u > 1
    assert scores["1111"] > scores["0111"]
    assert scores["0111"] > scores["0011"]
    assert scores["0000"] < 1.0 < scores["1111"]


def test_posteriors_are_probabilities():
    counts = {"1111": 10, "0000": 90, "1010": 7}
    for _p, _bf, post in pattern_scores(counts):
        assert 0.0 <= post <= 1.0


@pytest.fixture(scope="module")
def corpus():
    near = "shared common tokens appear in this document body here"
    rows = [
        # a clear duplicate pair: all four fields agree
        (1, "en", near, 55, "crawl-a"),
        (2, "en", near + " tail", 55, "crawl-a"),
        # same size+source, different text
        (3, "en", "completely different words entirely unrelated", 55,
         "crawl-a"),
        # different everything
        (4, "en", "zette qux words nothing alike", 200, "crawl-b"),
        (5, "de", near, 55, "crawl-a"),  # lang-gated away
    ] + [
        (10 + i, "en", f"filler{i} unique tokens number {i} padd", 80 + i,
         "crawl-c")
        for i in range(20)
    ]
    return rows


def test_duplicate_pair_scores_highest(spark, corpus):
    out = fellegi_sunter(_docs(spark, corpus)).collect()
    by_pair = {(r["doc_a"], r["doc_b"]): r for r in out}
    dup = by_pair[(1, 2)]
    assert dup["pattern"] == "1111"
    assert all(
        dup["bayes_factor"] >= r["bayes_factor"] for r in out
    )
    assert all(r["decision"] in ("link", "possible", "nonlink") for r in out)
    # cross-lang pairs never appear
    assert all(5 not in pair for pair in by_pair)


def test_pattern_fields(spark, corpus):
    out = fellegi_sunter(_docs(spark, corpus)).collect()
    by_pair = {(r["doc_a"], r["doc_b"]): r["pattern"] for r in out}
    # docs 1 vs 3: no token overlap majority, same size, same source,
    # different first token
    assert by_pair[(1, 3)] == "0110"
    # docs 1 vs 4: nothing agrees
    assert by_pair[(1, 4)] == "0000"


def test_partition_invariance(spark, corpus):
    def run(parts):
        return sorted(
            map(tuple, fellegi_sunter(_docs(spark, corpus, parts)).collect())
        )

    assert run(1) == run(7)
