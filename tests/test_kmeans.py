"""E68 fixed-point Lloyd k-means: independent numpy replay + planted
edge cases.

The driver's DuckDB oracle proves Spark-vs-SQL agreement at sf0.01; here
the expected answer is recomputed in pure numpy/int arithmetic (same
quantization, same truncating rounded-mean rule), plus: empty clusters
keep their previous centroid, argmin ties break to the lowest centroid
index, the update actually moves centroids (iters=2 differs from
iters=1 on separable data), and results are partition-invariant.
"""

from __future__ import annotations

import numpy as np
import pytest

from mediaduplicatefinder_spark.operators.kmeans import (
    _round_half_away_div,
    _tdiv,
    init_centroids,
    kmeans_fit,
)

DIM = 8
K = 8
SCALE = 1000


def _ref_kmeans(vecs: dict[int, np.ndarray], iters: int):
    """Pure-python replay of the documented fixed-point rounds."""
    def q_half_away(x: float) -> int:
        # HALF_UP (away from zero), the F.round/DuckDB round rule;
        # python's round() banker's-rounds and would diverge on .5
        return int(np.floor(abs(float(x)) * SCALE + 0.5)) * (1 if x >= 0 else -1)

    q = {
        vid: np.array([q_half_away(x) for x in v], dtype=np.int64)
        for vid, v in vecs.items()
    }
    cents = [np.array(c, dtype=np.int64) for c in init_centroids(DIM, K, SCALE)]

    def assign():
        out = {}
        for vid, x in q.items():
            ds = [int(((x - c) ** 2).sum()) for c in cents]
            out[vid] = min(range(K), key=lambda j: (ds[j], j))
        return out

    a = assign()
    for _ in range(iters - 1):
        nxt = []
        for j in range(K):
            members = [q[v] for v, cj in a.items() if cj == j]
            if not members:
                nxt.append(cents[j])
                continue
            s = np.sum(members, axis=0, dtype=np.int64)
            n = len(members)
            nxt.append(
                np.array([_round_half_away_div(int(e), n) for e in s], dtype=np.int64)
            )
        cents = nxt
        a = assign()
    return a


def _fit(spark, vecs: dict[int, np.ndarray], iters: int = 2, parts: int = 4):
    rows = [(int(vid), [float(x) for x in v]) for vid, v in vecs.items()]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>").repartition(
        parts
    )
    got = kmeans_fit(df, dim=DIM, k=K, iters=iters, scale=SCALE)
    return {r["vec_id"]: (r["cluster"], r["cluster_n"]) for r in got.collect()}


def test_rounding_helpers():
    assert _tdiv(7, 2) == 3 and _tdiv(-7, 2) == -3 and _tdiv(-8, 2) == -4
    # round-half-away-from-zero of s/n
    assert _round_half_away_div(3, 2) == 2
    assert _round_half_away_div(-3, 2) == -2
    assert _round_half_away_div(1, 3) == 0
    assert _round_half_away_div(-1, 3) == 0
    assert _round_half_away_div(5, 10) == 1
    assert _round_half_away_div(-5, 10) == -1
    assert _round_half_away_div(0, 7) == 0


def test_matches_numpy_replay(spark):
    rng = np.random.RandomState(7)
    vecs = {i: rng.standard_normal(DIM) * 0.2 for i in range(120)}
    want = _ref_kmeans(vecs, iters=2)
    got = _fit(spark, vecs, iters=2)
    assert {v: c for v, (c, _) in got.items()} == want
    # cluster_n is the final assignment's true size
    from collections import Counter

    sizes = Counter(want.values())
    assert all(n == sizes[c] for c, n in got.values())


def test_update_moves_centroids(spark):
    """Two tight blobs far from every seeded centroid: after one update
    the winning centroids sit on the blob means, so iters=2 must give a
    different (tighter) assignment than the data would get from the raw
    seeds alone — and the replay agrees at both depths."""
    rng = np.random.RandomState(11)
    blob_a = {i: np.full(DIM, 0.9) + rng.standard_normal(DIM) * 0.01 for i in range(30)}
    blob_b = {
        100 + i: np.full(DIM, -0.9) + rng.standard_normal(DIM) * 0.01 for i in range(30)
    }
    vecs = {**blob_a, **blob_b}
    for iters in (1, 2, 3):
        want = _ref_kmeans(vecs, iters=iters)
        got = _fit(spark, vecs, iters=iters)
        assert {v: c for v, (c, _) in got.items()} == want
    # separable blobs land in exactly two clusters after refinement
    final = _ref_kmeans(vecs, iters=3)
    assert len({final[v] for v in blob_a}) == 1
    assert len({final[v] for v in blob_b}) == 1
    assert {final[v] for v in blob_a} != {final[v] for v in blob_b}


def test_empty_clusters_keep_previous_centroid(spark):
    """5 points << 8 centroids: most clusters are empty every round —
    the COALESCE path must hold them at their previous position (the
    replay keeps them explicitly; divergence would misassign)."""
    rng = np.random.RandomState(3)
    vecs = {i: rng.standard_normal(DIM) * 0.15 for i in range(5)}
    want = _ref_kmeans(vecs, iters=3)
    got = _fit(spark, vecs, iters=3)
    assert {v: c for v, (c, _) in got.items()} == want


def test_partition_invariance(spark):
    rng = np.random.RandomState(23)
    vecs = {i: rng.standard_normal(DIM) * 0.2 for i in range(80)}
    a = _fit(spark, vecs, parts=1)
    b = _fit(spark, vecs, parts=7)
    assert a == b


def test_trained_centroids_feed_ivf(spark):
    """E68 -> E33 loop: on blob-clustered data, IVF probing with
    kmeans-trained centroids at n_probe=1 recovers the brute-force
    top-k that the untrained seeded table misses (the 'fit before
    relying on low probe counts' claim, ivf.py docstring)."""
    import numpy as np
    from pyspark.sql import functions as F

    from mediaduplicatefinder_spark.operators.ivf import ivf_topk
    from mediaduplicatefinder_spark.operators.kmeans import kmeans_centroids

    rng = np.random.RandomState(5)
    centers = rng.standard_normal((4, DIM)) * 1.0
    rows = []
    for i in range(160):
        c = centers[i % 4]
        rows.append((i, [float(x) for x in (c + rng.standard_normal(DIM) * 0.05)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    trained = kmeans_centroids(emb, dim=DIM, k=K, iters=3)
    queries = emb.filter(F.col("vec_id") % 40 == 0)  # one per blob

    got = ivf_topk(emb, queries, dim=DIM, k=5, n_probe=1, cents=trained)
    res = {(r["query_id"], r["vec_id"]) for r in got.collect()}

    # brute-force ground truth (cosine, self excluded)
    vecs = {i: np.array(v) for i, v in rows}
    truth = set()
    for q in (0, 40, 80, 120):
        qv = vecs[q]
        sims = sorted(
            ((float(qv @ v / (np.linalg.norm(qv) * np.linalg.norm(v))), i)
             for i, v in vecs.items() if i != q),
            key=lambda t: (-t[0], t[1]),
        )[:5]
        truth |= {(q, i) for _, i in sims}
    recall = len(res & truth) / len(truth)
    assert recall == 1.0
