"""Round-5 VERDICT item 3: the SHIPPED ANN operating-point rules are
recall-gated, the E33 pattern — no recommended default may regress
below usefulness.

The engine constants (K_CENTROIDS=8, DEFAULT_NPROBE=2, M_SUB=8,
KS=16, JL_DIM_OUT=16) are oracle-twin sizes: they keep the DuckDB
literal tables small so the correctness contract stays checkable.
The PRODUCTION sizing lives in ivfpq.recommended_config (nlist ~
sqrt(n), ~28% probed, 4-dim subspaces x 64 codewords, rerank
shortlist 1000) and jl.recommended_dim_out (k = ln n / eps^2) — and
these tests pin each rule to >= 0.8 recall@10 vs brute force on a
clustered corpus, with trained centroids/codebooks (the deployment
workflow BENCH/ANN.md measures; the seeded unit-box defaults are the
twin's, recall ~0.03).
"""

from __future__ import annotations

import numpy as np
import pytest

from mediaduplicatefinder_spark.operators.embeddings import cosine_topk
from mediaduplicatefinder_spark.operators.ivfpq import (
    ivfpq_rerank_topk,
    recommended_config,
)
from mediaduplicatefinder_spark.operators.jl import (
    JL_SEED,
    jl_topk,
    recommended_dim_out,
)

K = 10
NQ = 50


def _clustered(rng, n, dim, n_clusters, sigma):
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.randint(0, n_clusters, size=n)
    vecs = centers[assign] + sigma * rng.normal(size=(n, dim))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    return vecs


def _df(spark, vecs):
    rows = [(int(i), [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _kmeans(sample, k, iters=10, seed=0):
    r = np.random.RandomState(seed)
    c = sample[r.choice(len(sample), k, replace=False)].astype(np.float64)
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    for _ in range(iters):
        a = (sample @ c.T).argmax(axis=1)
        for j in range(k):
            m = sample[a == j]
            if len(m):
                c[j] = m.mean(axis=0)
        c /= np.linalg.norm(c, axis=1, keepdims=True)
    return c


def _truth(spark, corpus_df, queries_df):
    return {
        (r.query_id, r.vec_id)
        for r in cosine_topk(corpus_df, queries_df, k=K).collect()
    }


def test_ivfpq_recommended_config_recall_floor(spark):
    """recommended_config on a sigma-0.25 clustered corpus (the
    adversarial bench shape, scaled to n=3000/dim=32) with trained
    centroids + residual codebooks must clear 0.8 recall@10 —
    numpy-measured 0.97 at this point; the floor catches any rule or
    operator regression."""
    n, dim = 3000, 32
    rng = np.random.RandomState(11)
    vecs = _clustered(rng, n, dim, n_clusters=40, sigma=0.25)
    cfg = recommended_config(n, dim)
    assert cfg["n_cents"] == 55 and cfg["m"] == 8  # the rule itself

    cents = _kmeans(vecs, cfg["n_cents"])
    ca = (vecs @ cents.T).argmax(axis=1)
    scale = 1000
    res = (vecs - cents[ca]) * scale
    sub = dim // cfg["m"]
    r2 = np.random.RandomState(7)
    cbs = []
    for mi in range(cfg["m"]):
        sl = res[:, mi * sub : (mi + 1) * sub]
        cw = sl[r2.choice(len(sl), cfg["ks"], replace=False)].copy()
        for _ in range(8):
            d2 = ((sl[:, None, :] - cw[None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)
            for j in range(cfg["ks"]):
                m_ = sl[a == j]
                if len(m_):
                    cw[j] = m_.mean(axis=0)
        cbs.append([[int(round(x)) for x in c] for c in cw])

    corpus = _df(spark, vecs).persist()
    queries = corpus.filter(f"vec_id < {NQ}")
    truth = _truth(spark, corpus, queries)
    got = {
        (r.query_id, r.vec_id)
        for r in ivfpq_rerank_topk(
            corpus,
            queries,
            dim=dim,
            k=K,
            shortlist=cfg["shortlist"],
            n_probe=cfg["n_probe"],
            codebooks=cbs,
            m=cfg["m"],
            ks=cfg["ks"],
            scale=scale,
            cents=cents,
        ).collect()
    }
    corpus.unpersist()
    recall = len(got & truth) / len(truth)
    assert recall >= 0.8, f"ivfpq recommended-config recall {recall:.3f}"


def test_jl_recommended_dim_recall_floor(spark):
    """recommended_dim_out in JL's valid regime — a high-dim input
    (256-d) projected to the rule's 64-d (eps ~ 0.35 at n=2000) with
    the standard shortlist rerank — must clear 0.8 recall@10
    (numpy-measured 0.998).  The 64->16 collapse BENCH/ANN.md
    documents is the out-of-regime misuse this rule exists to
    prevent."""
    n, dim_in = 2000, 256
    rng = np.random.RandomState(11)
    vecs = _clustered(rng, n, dim_in, n_clusters=50, sigma=0.05)
    d_out = recommended_dim_out(n)
    assert d_out == 64  # the rule itself

    corpus = _df(spark, vecs).persist()
    queries = corpus.filter(f"vec_id < {NQ}")
    truth = _truth(spark, corpus, queries)
    short = jl_topk(
        corpus, queries, dim_in=dim_in, k=50, dim_out=d_out, seed=JL_SEED
    ).collect()
    corpus.unpersist()
    per_q: dict = {}
    for r in short:
        per_q.setdefault(r.query_id, []).append((r.cosine, r.vec_id))
    got = {
        (q, v)
        for q, lst in per_q.items()
        for _c, v in sorted(lst, reverse=True)[:K]
    }
    recall = len(got & truth) / len(truth)
    assert recall >= 0.8, f"JL recommended-dim recall {recall:.3f}"


def test_recommended_rules_shapes():
    assert recommended_config(50_000, 64) == {
        "n_cents": 224,
        "n_probe": 63,
        "m": 16,
        "ks": 64,
        "shortlist": 1000,
    }
    assert recommended_dim_out(50_000) == 96
    assert recommended_dim_out(2_000) == 64
    # degenerate corpora never produce zero-sized configs
    tiny = recommended_config(3, 8)
    assert tiny["n_cents"] >= 1 and tiny["n_probe"] >= 1
    assert recommended_dim_out(1) >= 8
