"""E188 RRF + E189 MMR: fusion semantics (consensus wins, absent-doc
zero contribution, calibration-freeness), MMR diversification (planted
duplicate clusters collapse to one pick each), python-replay parity,
and partition invariance."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mediaduplicatefinder_spark.operators.fusion_rank import (
    RRF_K,
    mmr_rerank,
    rrf_fuse,
)


def _ch(spark, rows, parts=3):
    return spark.createDataFrame(
        rows, "query_id long, vec_id long, score double"
    ).repartition(parts)


def test_rrf_consensus_beats_single_channel(spark):
    # doc 1 is rank-2 in ALL channels; doc 2 is rank-1 in one channel
    # only: consensus must win (the RRF paper's core behavior)
    a = [(0, 2, 0.99), (0, 1, 0.90), (0, 3, 0.10)]
    b = [(0, 1, 0.95), (0, 4, 0.99), (0, 5, 0.10)]
    c = [(0, 1, 0.80), (0, 6, 0.99), (0, 7, 0.10)]
    out = rrf_fuse(
        [("a", _ch(spark, a)), ("b", _ch(spark, b)), ("c", _ch(spark, c))],
        k=10,
    ).collect()
    by_rank = {r["rank"]: r for r in out}
    assert by_rank[1]["vec_id"] == 1
    assert by_rank[1]["n_channels"] == 3
    # expected score: three rank-2 contributions
    exp = 1.0 / (RRF_K + 2) + 1.0 / (RRF_K + 2) + 1.0 / (RRF_K + 2)
    assert abs(by_rank[1]["rrf_score"] - round(exp, 9)) < 1e-12


def test_rrf_calibration_free(spark):
    # multiplying one channel's scores by 1000 changes nothing:
    # only ranks enter
    a = [(0, i, 0.9 - i * 0.1) for i in range(5)]
    b = [(0, i, (0.9 - i * 0.07) * 1000) for i in range(5)]
    out1 = sorted(
        map(
            tuple,
            rrf_fuse(
                [("a", _ch(spark, a)), ("b", _ch(spark, b))], k=5
            ).collect(),
        )
    )
    b2 = [(q, v, s / 1000) for q, v, s in b]
    out2 = sorted(
        map(
            tuple,
            rrf_fuse(
                [("a", _ch(spark, a)), ("b", _ch(spark, b2))], k=5
            ).collect(),
        )
    )
    assert out1 == out2


def test_rrf_partition_invariance(spark):
    a = [(q, v, float(((q * 7 + v * 13) % 17)) / 17) for q in range(3)
         for v in range(8)]
    b = [(q, v, float(((q * 5 + v * 11) % 19)) / 19) for q in range(3)
         for v in range(8)]

    def run(parts):
        return sorted(
            map(
                tuple,
                rrf_fuse(
                    [("a", _ch(spark, a, parts)), ("b", _ch(spark, b, parts))],
                    k=4,
                ).collect(),
            )
        )

    assert run(1) == run(6)


def _cands(spark, rows, parts=3):
    return spark.createDataFrame(
        rows, "query_id long, vec_id long, rel double"
    ).repartition(parts)


def _sims(spark, rows, parts=3):
    return spark.createDataFrame(
        rows, "query_id long, vec_id_a long, vec_id_b long, sim double"
    ).repartition(parts)


def test_mmr_collapses_duplicate_cluster(spark):
    # docs 1,2,3 are near-identical (sim 0.99) and most relevant;
    # docs 4,5 unrelated. MMR top-3 must pick ONE of {1,2,3} then
    # diversify to 4 and 5.
    cands = [(0, 1, 0.95), (0, 2, 0.94), (0, 3, 0.93),
             (0, 4, 0.60), (0, 5, 0.55)]
    sims = [(0, 1, 2, 0.99), (0, 1, 3, 0.99), (0, 2, 3, 0.99),
            (0, 1, 4, 0.05), (0, 1, 5, 0.05), (0, 4, 5, 0.05),
            (0, 2, 4, 0.05), (0, 2, 5, 0.05), (0, 3, 4, 0.05),
            (0, 3, 5, 0.05)]
    out = mmr_rerank(
        _cands(spark, cands), _sims(spark, sims), k=3, lam=0.7
    ).collect()
    picks = [r["vec_id"] for r in sorted(out, key=lambda r: r["round"])]
    assert picks[0] == 1  # max rel
    assert set(picks[1:]) == {4, 5}  # duplicates 2,3 suppressed


def test_mmr_lambda_one_is_pure_relevance(spark):
    cands = [(0, i, 1.0 - i * 0.1) for i in range(1, 6)]
    sims = [(0, a, b, 0.9) for a in range(1, 6) for b in range(a + 1, 6)]
    out = mmr_rerank(
        _cands(spark, cands), _sims(spark, sims), k=3, lam=1.0
    ).collect()
    picks = [r["vec_id"] for r in sorted(out, key=lambda r: r["round"])]
    assert picks == [1, 2, 3]


def _py_mmr(cands, sims, k, lam):
    rel = {(q, v): r for q, v, r in cands}
    s = {}
    for q, a, b, x in sims:
        s[(q, a, b)] = x
        s[(q, b, a)] = x
    out = {}
    for q in sorted({q for q, _v, _r in cands}):
        pool = sorted(v for qq, v, _r in cands if qq == q)
        sel = []
        for r in range(min(k, len(pool))):
            best = None
            for v in pool:
                if v in sel:
                    continue
                if r == 0:
                    sc = rel[(q, v)]
                else:
                    pen = max(
                        (s.get((q, v, t), 0.0) for t in sel), default=0.0
                    )
                    sc = lam * rel[(q, v)] - (1.0 - lam) * pen
                if best is None or sc > best[0] or (
                    sc == best[0] and v < best[1]
                ):
                    best = (sc, v)
            sel.append(best[1])
            out[(q, best[1])] = (r, round(best[0], 9))
    return out


def test_mmr_matches_python_replay(spark):
    rng = np.random.default_rng(3)
    cands = [
        (q, v, float(round(rng.uniform(0.2, 0.99), 6)))
        for q in range(3)
        for v in range(1, 10)
    ]
    sims = [
        (q, a, b, float(round(rng.uniform(0.0, 0.9), 6)))
        for q in range(3)
        for a in range(1, 10)
        for b in range(a + 1, 10)
    ]
    out = mmr_rerank(
        _cands(spark, cands), _sims(spark, sims), k=4, lam=0.7
    ).collect()
    ref = _py_mmr(cands, sims, 4, 0.7)
    got = {
        (r["query_id"], r["vec_id"]): (r["round"], r["mmr_score"])
        for r in out
    }
    assert set(got) == set(ref)
    for key in ref:
        assert got[key][0] == ref[key][0]
        assert abs(got[key][1] - ref[key][1]) < 1e-9
