"""E33 IVF-probed ANN: recall vs the brute-force baseline, probe
monotonicity, and plan shape (broadcast probe join — the corpus side
must not shuffle on the K-distinct-key cluster column)."""

from __future__ import annotations

import numpy as np
import pytest

from mediaduplicatefinder_spark.operators.embeddings import cosine_topk
from mediaduplicatefinder_spark.operators.ivf import ivf_topk
from mediaduplicatefinder_spark.operators.semdedup import (
    K_CENTROIDS,
    centroids,
)

DIM = 16
N = 400
K = 5


@pytest.fixture(scope="module")
def emb(spark):
    # clustered corpus: vectors near centroids so inverted lists are
    # meaningful (pure-noise corpora make ANY partitioning useless)
    cents = centroids(DIM, K_CENTROIDS)
    rng = np.random.RandomState(123)
    rows = []
    for i in range(N):
        c = cents[i % K_CENTROIDS]
        v = c + 0.4 * rng.standard_normal(DIM)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _recall(approx, exact):
    a = {}
    for r in approx:
        a.setdefault(r["query_id"], set()).add(r["vec_id"])
    e = {}
    for r in exact:
        e.setdefault(r["query_id"], set()).add(r["vec_id"])
    hits = sum(len(a.get(q, set()) & s) for q, s in e.items())
    total = sum(len(s) for s in e.values())
    return hits / total


def test_ivf_recall_vs_brute_force(spark, emb):
    queries = emb.filter("vec_id % 40 = 0")
    exact = cosine_topk(emb, queries, k=K).collect()
    approx = ivf_topk(emb, queries, dim=DIM, k=K, n_probe=2).collect()
    # clustered data + 2-of-8 probes: the true neighbors live in the
    # query's own (or adjacent) list
    assert _recall(approx, exact) >= 0.8
    # every returned cosine is exact (same rounded kernel): approx
    # results must be a subset of the full scored relation
    exact_all = {
        (r["query_id"], r["vec_id"]): r["cosine"]
        for r in cosine_topk(emb, queries, k=N).collect()
    }
    for r in approx:
        assert exact_all[(r["query_id"], r["vec_id"])] == r["cosine"]


def test_ivf_probe_monotone_recall(spark, emb):
    queries = emb.filter("vec_id % 40 = 0")
    exact = cosine_topk(emb, queries, k=K).collect()
    r1 = _recall(ivf_topk(emb, queries, dim=DIM, k=K, n_probe=1).collect(), exact)
    rall = _recall(
        ivf_topk(emb, queries, dim=DIM, k=K, n_probe=K_CENTROIDS).collect(),
        exact,
    )
    assert r1 <= rall
    # probing ALL lists == exhaustive search
    assert rall == 1.0


def test_ivf_rank_contract(spark, emb):
    queries = emb.filter("vec_id % 40 = 0")
    rows = ivf_topk(emb, queries, dim=DIM, k=K).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r["rk"])
        assert [r["rk"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= K
        # descending cosine, ties by vec_id; self excluded
        for a, b in zip(rs, rs[1:]):
            assert (a["cosine"], -a["vec_id"]) >= (b["cosine"], -b["vec_id"])
        assert all(r["vec_id"] != q for r in rs)


def test_ivf_corpus_side_does_not_shuffle(spark, emb):
    queries = emb.filter("vec_id % 40 = 0")
    plan = (
        ivf_topk(emb, queries, dim=DIM, k=K)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    # the probe side is broadcast; the only hash exchange is the
    # per-query top-k window
    assert "BroadcastHashJoin" in plan


def test_index_reuse_identical(spark, emb):
    # FAISS add/search split: searching a pre-built ivf_index must be
    # row-identical to the inline-assignment path
    from mediaduplicatefinder_spark.operators.ivf import ivf_index

    queries = emb.filter("vec_id % 7 = 0")
    inline = sorted(
        map(tuple, ivf_topk(emb, queries, dim=DIM, k=5, n_probe=2).collect())
    )
    idx = ivf_index(emb, DIM).persist()
    indexed = sorted(
        map(
            tuple,
            ivf_topk(
                emb, queries, dim=DIM, k=5, n_probe=2, index=idx
            ).collect(),
        )
    )
    idx.unpersist()
    assert inline == indexed
