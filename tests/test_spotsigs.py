"""E177 SpotSigs: spot extraction semantics (antecedent anchoring,
chain skipping, incomplete-chain drop), multiset-Jaccard exactness vs
a python reference, block purging + length filter behavior, and
partition invariance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mediaduplicatefinder_spark.operators.spotsigs import (
    ANTECEDENTS,
    extract_spots,
    spotsig_pairs,
)


def _docs(spark, rows, parts=1):
    return spark.createDataFrame(
        rows, "doc_id long, lang string, text string"
    ).repartition(parts)


def test_extract_anchors_and_chains():
    # "the quick brown" anchors at "the"; chains skip antecedents
    spots = extract_spots("the quick brown fox")
    assert "the:quick:brown" in spots
    # antecedents inside the chain window are skipped, not consumed
    spots = extract_spots("the a is quick brown fox")
    assert spots[0] == "the:quick:brown"
    # all three antecedents anchor the SAME chain words
    assert spots == ["the:quick:brown", "a:quick:brown", "is:quick:brown"]


def test_extract_incomplete_chain_dropped():
    assert extract_spots("quick the brown") == []
    assert extract_spots("the brown") == []
    assert extract_spots("the") == []
    assert extract_spots("") == []


def test_extract_multiset_preserved():
    spots = extract_spots("the quick brown then the quick brown end")
    assert spots.count("the:quick:brown") == 2


def test_normalization_matches_engine():
    # punctuation stripped, case folded — same normalization as sigcore
    assert extract_spots("The QUICK, brown?") == extract_spots(
        "the quick brown"
    )


def _py_pairs(rows, tau_num=3, tau_den=10, cap=256):
    """Independent python reference for the full operator."""
    from collections import Counter, defaultdict

    spots = {d: Counter(extract_spots(t)) for d, _l, t in rows}
    lang = {d: l for d, l, _t in rows}
    df = defaultdict(set)
    for d, c in spots.items():
        for s in c:
            df[(lang[d], s)].add(d)
    cands = set()
    for (lg, _s), docs in df.items():
        docs = sorted(docs)
        if 2 <= len(docs) <= cap:
            for i in range(len(docs)):
                for j in range(i + 1, len(docs)):
                    cands.add((lg, docs[i], docs[j]))
    out = {}
    for lg, a, b in cands:
        ca, cb = spots[a], spots[b]
        ta, tb = sum(ca.values()), sum(cb.values())
        if min(ta, tb) * tau_den < max(ta, tb) * tau_num:
            continue
        common = sum(min(ca[s], cb[s]) for s in ca.keys() & cb.keys())
        out[(lg, a, b)] = (
            ta,
            tb,
            common,
            common * tau_den >= tau_num * (ta + tb - common),
        )
    return out


@pytest.fixture(scope="module")
def corpus():
    base = "the quick brown fox is a lazy dog in the tall grass today"
    rows = [
        (1, "en", base),
        (2, "en", base + " extra words appended here"),  # near-dup of 1
        (3, "en", "the slow red cat is a happy bird in the low sky now"),
        (4, "en", base),  # exact dup of 1
        (5, "de", base),  # different lang: never pairs with en
        (6, "en", "no anchors here whatsoever"),  # zero spots
    ]
    return rows


def test_pairs_match_python_reference(spark, corpus):
    got = {
        (r["lang"], r["doc_a"], r["doc_b"]): (
            r["tot_a"],
            r["tot_b"],
            r["n_common"],
            r["is_dup"],
        )
        for r in spotsig_pairs(_docs(spark, corpus)).collect()
    }
    assert got == _py_pairs(corpus)
    # sanity on content: exact dup pair is a dup, cross-lang absent
    assert got[("en", 1, 4)][3] is True
    assert all(l == "en" for (l, _a, _b) in got)


def test_block_purging_caps_hot_spots(spark):
    # 40 docs all sharing ONE boilerplate spot, cap=8: spot purged,
    # zero candidate pairs survive
    rows = [(i, "en", "the nav menu") for i in range(40)]
    out = spotsig_pairs(_docs(spark, rows), spot_df_cap=8).collect()
    assert out == []


def test_length_filter_prunes(spark):
    # doc 2 has 5x the spots of doc 1 -> min/max < 0.3 -> pruned even
    # though they share a spot
    rows = [
        (1, "en", "the quick brown"),
        (2, "en", "the quick brown " + "is x y " * 20),
    ]
    out = spotsig_pairs(_docs(spark, rows)).collect()
    assert out == []
    # same pair passes with tau = 0
    out = spotsig_pairs(_docs(spark, rows), tau_num=0, tau_den=1).collect()
    assert len(out) == 1 and out[0]["n_common"] == 1


def test_partition_invariance(spark, corpus):
    def run(parts):
        return sorted(
            map(tuple, spotsig_pairs(_docs(spark, corpus, parts)).collect())
        )

    assert run(1) == run(7)


def test_antecedents_survive_normalization():
    # every antecedent must be a lowercase alnum token (else extraction
    # could never anchor on it)
    for a in ANTECEDENTS:
        assert a == a.lower() and a.isalnum()
