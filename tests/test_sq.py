"""E183 SQ8: quantizer mechanics (code range, degenerate dims,
midpoint reconstruction error bound), recall of quantized ranking vs
exact top-k, and partition invariance."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mediaduplicatefinder_spark.operators.embeddings import cosine_topk
from mediaduplicatefinder_spark.operators.sq import (
    encode_sq8,
    sq8_stats,
    sq8_topk,
)


def _emb_df(spark, vecs, parts=4):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).repartition(parts)


@pytest.fixture(scope="module")
def clustered():
    rng = np.random.default_rng(9)
    centers = rng.normal(size=(6, 24)) * 4
    return [
        (centers[i % 6] + rng.normal(size=24) * 0.3).astype(np.float32)
        for i in range(150)
    ]


def test_codes_in_range_and_monotone(spark):
    vecs = [[float(i), 0.0] for i in range(11)]
    df = _emb_df(spark, vecs, 2)
    mins, maxs = sq8_stats(df)
    assert mins == [0.0, 0.0] and maxs == [10.0, 0.0]
    codes = {
        r["vec_id"]: r["codes"]
        for r in encode_sq8(df, mins, maxs).collect()
    }
    c0 = [codes[i][0] for i in range(11)]
    assert c0[0] == 0 and c0[-1] == 255
    assert c0 == sorted(c0)  # monotone in the value
    # degenerate dimension (mx == mn) -> code 0 everywhere
    assert all(codes[i][1] == 0 for i in range(11))


def test_reconstruction_error_half_step(spark, clustered):
    df = _emb_df(spark, clustered)
    mins, maxs = sq8_stats(df)
    # midpoint decode error <= step/2 per dim
    enc = encode_sq8(df, mins, maxs).collect()
    mn, mx = np.array(mins), np.array(maxs)
    step = (mx - mn) / 255
    for r in enc[:20]:
        v = np.array(r["embedding"], dtype=np.float64)
        code = np.array(r["codes"], dtype=np.float64)
        recon = mn + (code + 0.5) * step
        assert np.all(np.abs(v - recon) <= step / 2 + 1e-12)


def test_recall_vs_exact_topk(spark, clustered):
    df = _emb_df(spark, clustered)
    qs = df.filter(F.col("vec_id") % 10 == 0)
    exact = {
        (r["query_id"], r["vec_id"])
        for r in cosine_topk(df, qs, k=10).collect()
    }
    sq = {
        (r["query_id"], r["vec_id"])
        for r in sq8_topk(df, qs, k=10).collect()
    }
    recall = len(exact & sq) / len(exact)
    assert recall >= 0.9, recall


def test_quantized_vs_exact_cosine_close(spark, clustered):
    df = _emb_df(spark, clustered)
    qs = df.filter(F.col("vec_id") % 30 == 0)
    rows = sq8_topk(df, qs, k=5).collect()
    errs = [abs(r["cosine_sq"] - r["cosine"]) for r in rows]
    assert max(errs) < 0.02 and sum(errs) / len(errs) < 0.005


def test_partition_invariance(spark, clustered):
    def run(parts):
        df = _emb_df(spark, clustered, parts)
        qs = df.filter(F.col("vec_id") % 25 == 0)
        return sorted(map(tuple, sq8_topk(df, qs, k=5).collect()))

    assert run(1) == run(9)
