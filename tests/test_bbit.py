"""E78 b-bit MinHash compression (operators/bbit.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mediaduplicatefinder_spark.config import DEFAULT_CONFIG
from mediaduplicatefinder_spark.operators.bbit import (
    BBIT_B,
    bbit_minhash_pairs,
)

K = DEFAULT_CONFIG.num_perm
CB = 1.0 / (1 << BBIT_B)


def _sigs(spark, rows):
    # rows: (url, doc_key, minhash list)
    return spark.createDataFrame(
        rows, "url string, doc_key long, minhash array<long>"
    )


def _cands(spark, pairs):
    return spark.createDataFrame(pairs, "key_a long, key_b long")


def test_identical_and_disjoint(spark):
    a = list(range(K))
    b = [x + (1 << 40) for x in range(K)]  # same low bits, all slots differ
    c = [x * 16 + 7 for x in range(K)]  # low-4-bits constant 7
    sigs = _sigs(
        spark, [("u://a", 1, a), ("u://b", 2, b), ("u://c", 3, c)]
    )
    rows = {
        (r.url_a, r.url_b): r
        for r in bbit_minhash_pairs(
            _cands(spark, [(1, 1), (1, 2), (1, 3)]), sigs
        ).collect()
    }
    # self pair: everything matches, both estimates exactly 1
    self_r = rows[("u://a", "u://a")]
    assert self_r.full_match == K and self_r.bbit_match == K
    assert self_r.mh_est == 1.0 and self_r.bbit_est == 1.0
    # a vs b: full match 0, but ALL low-4-bit slots collide ->
    # bbit_est hits its ceiling while mh_est is 0 (the documented
    # compression failure mode the correction cannot fix)
    ab = rows[("u://a", "u://b")]
    assert ab.full_match == 0 and ab.bbit_match == K
    assert ab.mh_est == 0.0 and ab.bbit_est == 1.0
    # a vs c: slots where a's low bits == 7 collide; a's low bits cycle
    # 0..15 so exactly K/16 slots collide -> est (1/16 - Cb)/(1-Cb) = 0
    ac = rows[("u://a", "u://c")]
    assert ac.full_match == 0
    assert ac.bbit_match == K // 16
    assert ac.bbit_est == pytest.approx(0.0, abs=1e-12)


def test_estimator_formula(spark):
    # 96 of 128 slots equal -> mh_est = 0.75; bbit matches >= full
    a = list(range(K))
    b = a[:96] + [x + (1 << 40) for x in range(96, K)]
    sigs = _sigs(spark, [("u://a", 1, a), ("u://b", 2, b)])
    r = bbit_minhash_pairs(_cands(spark, [(1, 2)]), sigs).collect()[0]
    assert r.full_match == 96
    assert r.mh_est == 96 / K
    assert r.bbit_match == K  # the +2^40 trick keeps low bits equal
    assert r.bbit_est == ((r.bbit_match / K) - CB) / (1 - CB)


def test_negative_values_mask(spark):
    # signed minhash values: low-bit mask must treat them as raw bits
    a = [-1] * K  # low 4 bits = 0b1111
    b = [15] * K  # low 4 bits = 0b1111, different value
    sigs = _sigs(spark, [("u://a", 1, a), ("u://b", 2, b)])
    r = bbit_minhash_pairs(_cands(spark, [(1, 2)]), sigs).collect()[0]
    assert r.full_match == 0 and r.bbit_match == K


def test_symmetry_and_url_order(spark):
    a = list(range(K))
    b = [x + (1 << 40) for x in range(K)]
    sigs = _sigs(spark, [("u://z", 1, a), ("u://a", 2, b)])
    r = bbit_minhash_pairs(_cands(spark, [(1, 2)]), sigs).collect()[0]
    assert (r.url_a, r.url_b) == ("u://a", "u://z")  # lexicographic
