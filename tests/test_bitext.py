"""Margin-based bitext mining (operators/bitext.py, Artetxe/Schwenk
ACL'19): hub suppression, isolated-pair reward, python reference."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from mediaduplicatefinder_spark.operators.bitext import margin_pairs

SCALE = 1_000_000


def _emb_df(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<double>",
    )


def _py_margin(vecs, k, floor, thr):
    def cos6(a, b):
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        if na > 0 and nb > 0:
            return round(sum(x * y for x, y in zip(a, b)) / (na * nb), 6)
        return 0.0

    src = sorted(i for i in vecs if i % 2 == 0)
    tgt = sorted(i for i in vecs if i % 2 == 1)
    c = {(s, t): cos6(vecs[s], vecs[t]) for s in src for t in tgt}
    ci = {p: round(v * SCALE) for p, v in c.items()}
    s_src = {
        s: sum(
            ci[(s, t)]
            for t in sorted(tgt, key=lambda t: (-c[(s, t)], t))[:k]
        )
        for s in src
    }
    s_tgt = {
        t: sum(
            ci[(s, t)]
            for s in sorted(src, key=lambda s: (-c[(s, t)], s))[:k]
        )
        for t in tgt
    }
    out = {}
    for (s, t), v in c.items():
        den = s_src[s] + s_tgt[t]
        if den <= 0:
            continue
        m = ci[(s, t)] * 2 * k / den
        if v >= floor and m >= thr:
            out[(s, t)] = (v, m)
    return out


def test_isolated_pair_beats_hub_pairs(spark):
    # side A (even ids) / side B (odd ids). ids 0/1: an isolated
    # mutual pair in their own direction. ids 2,4,6 (A) all hug e1;
    # 3 (B) is the hub next to them; 5 (B) is slightly offset.
    rows = [
        (0, [0.0, 0.0, 1.0]),
        (1, [0.0, 0.02, 1.0]),
        (2, [1.0, 0.0, 0.0]),
        (4, [1.0, 0.03, 0.0]),
        (6, [1.0, 0.06, 0.0]),
        (3, [1.0, 0.01, 0.0]),
        (5, [0.9, 0.4, 0.0]),
    ]
    got = {
        (r["vec_src"], r["vec_tgt"]): r["margin"]
        for r in margin_pairs(
            _emb_df(spark, rows),
            side=F.pmod("vec_id", F.lit(2)),
            k=2,
            floor=0.3,
            margin_threshold=0.0,
        ).collect()
    }
    # the isolated pair stands far above its (weak) neighborhood
    # density; the hub's pairs sit at ~their neighborhood mean
    assert got[(0, 1)] > got[(2, 3)]
    assert got[(0, 1)] > got[(4, 3)]


def test_matches_python_reference(spark):
    rng = random.Random(99)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(4)]) for i in range(14)
    ]
    want = _py_margin(dict(rows), k=3, floor=0.2, thr=1.0)
    got = {
        (r["vec_src"], r["vec_tgt"]): (r["cosine"], r["margin"])
        for r in margin_pairs(
            _emb_df(spark, rows),
            side=F.pmod("vec_id", F.lit(2)),
            k=3,
            floor=0.2,
            margin_threshold=1.0,
        ).collect()
    }
    assert set(got) == set(want)
    for p in want:
        assert got[p][0] == want[p][0]
        assert abs(got[p][1] - want[p][1]) < 1e-12


def test_threshold_filters(spark):
    rows = [(i, [float(i % 2), 1.0]) for i in range(8)]
    out = margin_pairs(
        _emb_df(spark, rows),
        side=F.pmod("vec_id", F.lit(2)),
        k=2,
        floor=0.3,
        margin_threshold=99.0,
    ).collect()
    assert out == []  # nothing clears an absurd margin bar


def test_pluggable_candidate_relation(spark):
    # margins over a shortlist relation only: the k-NN means see just
    # the supplied pairs (the ANN-deployment shape)
    rows = [(i, [float(i % 2), 1.0, 0.1 * i]) for i in range(6)]
    df = _emb_df(spark, rows)
    shortlist = spark.createDataFrame(
        [(0, 1, 0.9), (2, 3, 0.8), (1, 4, 0.7)],
        "vid_a long, vid_b long, cosine double",
    )
    got = {
        (r["vec_src"], r["vec_tgt"]): r["margin"]
        for r in margin_pairs(
            df,
            side=F.pmod("vec_id", F.lit(2)),
            k=2,
            floor=0.0,
            margin_threshold=0.0,
            cand_pairs=shortlist,
        ).collect()
    }
    assert set(got) == {(0, 1), (2, 3), (4, 1)}
    # (2,3) is isolated in the shortlist: margin = c*2k/(c*k? ...) —
    # both endpoints' only neighbor is each other, so sums = its own
    # ci and margin = ci*4 / (2*ci) = 2.0 exactly
    import pytest as _pytest

    assert got[(2, 3)] == _pytest.approx(2.0, abs=1e-12)
