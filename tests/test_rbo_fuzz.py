"""Seeded fuzz: rbo_topk (windows/join/fixed-order chain) against an
independent pure-Python prefix-overlap reference on random lists."""

from __future__ import annotations

import random

import pytest

from mediaduplicatefinder_spark.operators.rbo import rbo_topk


def _py_rbo(a_ids, b_ids, k, p):
    acc = 0.0
    for d in range(1, k + 1):
        coeff = p ** (d - 1) / d
        a_d = len(set(a_ids[:d]) & set(b_ids[:d]))
        acc = acc + coeff * float(a_d)
    ov = len(set(a_ids[:k]) & set(b_ids[:k]))
    return ov, (1.0 - p) * acc


def test_fuzz_against_python_reference(spark):
    rng = random.Random(4242)
    rows_a, rows_b, expect = [], [], {}
    for q in range(8):
        k = 10
        pool = list(range(100))
        rng.shuffle(pool)
        a_ids = pool[:k]
        # b: overlap a random prefix amount, then fresh items
        cut = rng.randint(0, k)
        b_ids = rng.sample(a_ids, cut) + pool[k : 2 * k - cut]
        rng.shuffle(b_ids)
        rows_a += [(q, v, 1.0 - 0.01 * i) for i, v in enumerate(a_ids)]
        rows_b += [(q, v, 1.0 - 0.01 * i) for i, v in enumerate(b_ids)]
        expect[q] = _py_rbo(a_ids, b_ids, k, 0.9)
    schema = "query_id long, vec_id long, cosine double"
    got = {
        r["query_id"]: (r["overlap_k"], r["rbo"])
        for r in rbo_topk(
            spark.createDataFrame(rows_a, schema),
            spark.createDataFrame(rows_b, schema),
            k=10,
            p=0.9,
        ).collect()
    }
    assert set(got) == set(expect)
    for q in expect:
        assert got[q][0] == expect[q][0]
        # same fixed-order float chain -> bit-identical, but allow 1 ulp
        assert got[q][1] == pytest.approx(expect[q][1], abs=1e-15)
        assert 0.0 <= got[q][1] <= 1.0
