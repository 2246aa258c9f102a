"""Weighted (tf-bag) exact Jaccard join via bag-to-set expansion
(operators/ppjoin.weighted_ppjoin_pairs) — must equal the naive
sum(min)/sum(max) computation at every threshold."""

from __future__ import annotations

import itertools
import random
from collections import Counter

import pytest

from mediaduplicatefinder_spark.operators.ppjoin import weighted_ppjoin_pairs


def _naive_w(bags: dict[int, list[str]], t: float) -> dict[tuple[int, int], float]:
    out = {}
    for a, b in itertools.combinations(sorted(bags), 2):
        ca, cb = Counter(bags[a]), Counter(bags[b])
        if not ca or not cb:
            continue
        inter = sum(min(ca[k], cb[k]) for k in ca.keys() & cb.keys())
        union = sum(ca.values()) + sum(cb.values()) - inter
        jac = inter / union
        if jac >= t:
            out[(a, b)] = jac
    return out


def _run(spark, bags, t):
    df = spark.createDataFrame(
        list(bags.items()), "doc_id long, bag array<string>"
    )
    got = {
        (r.doc_a, r.doc_b): r.wjaccard
        for r in weighted_ppjoin_pairs(df, "doc_id", "bag", threshold=t).collect()
    }
    want = _naive_w(bags, t)
    assert got == want  # exact float equality: same integer division
    return got


def test_repetition_separates_from_set_jaccard(spark):
    # same token SET, different tf profile: set-Jaccard 1.0, weighted below
    bags = {
        1: ["spam"] * 10 + ["ham"],
        2: ["spam"] + ["ham"],
        3: ["spam"] * 10 + ["ham"],
    }
    got = _run(spark, bags, 0.5)
    assert (1, 3) in got and got[(1, 3)] == 1.0
    assert (1, 2) not in got  # min-sum 2 / max-sum 11 = 0.18
    _run(spark, bags, 0.1)  # at 0.1 the (1,2)/(2,3) pairs appear


@pytest.mark.parametrize("t", [0.3, 0.5, 0.8, 1.0])
def test_matches_naive_random(spark, t):
    rng = random.Random(13)
    words = [f"w{i}" for i in range(25)]
    bags = {
        i: [rng.choice(words) for _ in range(rng.randint(1, 30))]
        for i in range(30)
    }
    bags[30] = list(bags[0])  # exact dup (same multiset, order differs)
    rng.shuffle(bags[30])
    _run(spark, bags, t)


def test_empty_bags_dropped(spark):
    bags = {1: ["aaa", "aaa", "bbb"], 2: [], 3: ["aaa", "aaa", "bbb"]}
    got = _run(spark, bags, 0.9)
    assert set(got) == {(1, 3)}
