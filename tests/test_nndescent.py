"""E179 NN-Descent: recall gate vs brute-force k-NN on clustered data
(the paper's convergence claim), monotone recall per round, exact
python replay of the full deterministic trajectory, edge cases, and
partition invariance."""

from __future__ import annotations

import numpy as np
import pytest

from mediaduplicatefinder_spark.operators.nndescent import (
    NND_SEED,
    _init_offsets,
    nndescent_knn,
)


def _emb_df(spark, vecs, parts=4):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).repartition(parts)


def _cos6(a, b):
    na, nb = np.sqrt(a @ a), np.sqrt(b @ b)
    if na <= 0 or nb <= 0:
        return 0.0
    return round(float(a @ b) / float(na * nb), 6)


def _py_nndescent(vecs, k, n_iter, seed=NND_SEED):
    """Independent python replay of the deterministic trajectory.
    NOTE floats: the reference reproduces the DECISIONS (top-k by
    round-6 cosine); vecs are cast float32->float64 like both engines."""
    vecs = [np.asarray(v, dtype=np.float32).astype(np.float64) for v in vecs]
    n = len(vecs)
    offs = sorted(set(_init_offsets(k, n, seed)))
    nbr = {u: sorted({(u + o) % n for o in offs}) for u in range(n)}

    def topk(cands):
        out = {}
        for u, vs in cands.items():
            scored = sorted(
                ((-_cos6(vecs[u], vecs[v]), v) for v in vs),
            )[: min(k, n - 1)]
            out[u] = [(v, -negc) for negc, v in scored]
        return out

    knn = topk(nbr)
    for _ in range(n_iter):
        sym = {u: set() for u in range(n)}
        for u, lst in knn.items():
            for v, _c in lst:
                sym[u].add(v)
                sym[v].add(u)
        cands = {u: set(v for v, _ in knn[u]) for u in range(n)}
        for m, outs in sym.items():
            for s in outs:
                for t in outs:
                    if s != t:
                        cands[s].add(t)
        knn = topk(cands)
    return {
        (u, v, r + 1): c
        for u, lst in knn.items()
        for r, (v, c) in enumerate(lst)
    }


@pytest.fixture(scope="module")
def clustered():
    rng = np.random.default_rng(7)
    centers = rng.normal(size=(8, 16)) * 5
    vecs = []
    for i in range(160):
        vecs.append(centers[i % 8] + rng.normal(size=16) * 0.4)
    return [v.astype(np.float32) for v in vecs]


def _brute(vecs, k):
    vs = [np.asarray(v, dtype=np.float32).astype(np.float64) for v in vecs]
    truth = set()
    for u in range(len(vs)):
        scored = sorted(
            ((-_cos6(vs[u], vs[v]), v) for v in range(len(vs)) if v != u)
        )[:k]
        truth.update((u, v) for _c, v in scored)
    return truth


def test_matches_python_replay(spark, clustered):
    got = {
        (r["vec_id"], r["nbr_id"], r["rank"]): r["cosine"]
        for r in nndescent_knn(
            _emb_df(spark, clustered), k=6, n_iter=2
        ).collect()
    }
    ref = _py_nndescent(clustered, k=6, n_iter=2)
    assert set(got) == set(ref)
    for key, c in ref.items():
        assert abs(got[key] - c) < 1e-9


def test_recall_gate_and_monotone(spark, clustered):
    truth = _brute(clustered, 6)
    last = 0.0
    recalls = []
    for it in (0, 1, 2, 3):
        got = {
            (r["vec_id"], r["nbr_id"])
            for r in nndescent_knn(
                _emb_df(spark, clustered), k=6, n_iter=it
            ).collect()
        }
        rec = len(truth & got) / len(truth)
        recalls.append(rec)
        assert rec >= last - 1e-9, recalls
        last = rec
    # clustered data: the paper's regime — near-perfect by round 3
    assert recalls[-1] >= 0.95, recalls


def test_every_node_gets_k(spark, clustered):
    out = nndescent_knn(_emb_df(spark, clustered), k=6, n_iter=1).collect()
    per = {}
    for r in out:
        per.setdefault(r["vec_id"], []).append(r["rank"])
    assert len(per) == len(clustered)
    assert all(sorted(v) == [1, 2, 3, 4, 5, 6] for v in per.values())


def test_tiny_corpora(spark):
    # n=1: no possible neighbor -> empty
    out = nndescent_knn(_emb_df(spark, [[1.0, 0.0]]), k=4).collect()
    assert out == []
    # n=3, k=10: k_eff = 2, complete graph recovered exactly
    vecs = [[1.0, 0.0], [0.9, 0.1], [0.0, 1.0]]
    out = nndescent_knn(_emb_df(spark, vecs), k=10, n_iter=1).collect()
    per = {}
    for r in out:
        per.setdefault(r["vec_id"], set()).add(r["nbr_id"])
    assert per == {0: {1, 2}, 1: {0, 2}, 2: {0, 1}}


def test_partition_invariance(spark, clustered):
    def run(parts):
        return sorted(
            map(
                tuple,
                nndescent_knn(
                    _emb_df(spark, clustered, parts), k=5, n_iter=2
                ).collect(),
            )
        )

    assert run(1) == run(13)
