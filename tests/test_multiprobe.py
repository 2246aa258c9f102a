"""Multi-probe LSH ANN (operators/embeddings.py multiprobe_lsh_topk,
E167 — Lv et al. VLDB'07): probe-set structure vs a numpy reference,
n_flips=0 degeneracy to the single-probe channel, candidate-superset /
recall monotonicity, recall-vs-brute gate, partition invariance."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mediaduplicatefinder_spark.operators import embeddings as emb_ops

from tests.test_embeddings_multimodal import make_clustered_vectors


@pytest.fixture(scope="module")
def clustered(spark):
    pdf, truth = make_clustered_vectors()
    df = spark.createDataFrame(pdf).persist()
    df.count()
    return df, truth


def _ref_probes(vecs, n_flips):
    """numpy reference: signature + single-bit flips of the n_flips
    lowest-|projection| bits (ascending |p|, bit-index ties)."""
    planes = emb_ops._hyperplanes(vecs.shape[1])
    proj = np.zeros((len(vecs), emb_ops.SIMHASH_BITS))
    for d in range(vecs.shape[1]):
        proj += vecs[:, d : d + 1] * planes[d][None, :]
    weights = 1 << np.arange(emb_ops.SIMHASH_BITS, dtype=np.uint64)
    sig = ((proj > 0).astype(np.uint64) * weights).sum(axis=1)
    out = []
    for r in range(len(vecs)):
        order = sorted(
            range(emb_ops.SIMHASH_BITS), key=lambda i: (abs(proj[r, i]), i)
        )
        probes = [int(sig[r])] + [
            int(sig[r] ^ np.uint64(1) << np.uint64(i))
            for i in order[:n_flips]
        ]
        out.append([np.int64(np.uint64(p)).item() for p in probes])
    return out


def test_probe_set_matches_reference(spark):
    pdf, _ = make_clustered_vectors(n_clusters=6, per_cluster=2, dim=16)
    df = spark.createDataFrame(pdf)
    got = (
        emb_ops.with_query_probes(df, n_flips=5)
        .groupBy("vec_id")
        .agg(F.collect_list("probe").alias("ps"))
        .collect()
    )
    vecs = np.array([np.asarray(v) for v in pdf["embedding"]])
    ref = _ref_probes(vecs, 5)
    for r in got:
        assert r.ps == ref[r.vec_id], r.vec_id
        # original signature first, all probes distinct, each flip is
        # exactly one bit away from the original
        assert len(set(r.ps)) == 6
        for p in r.ps[1:]:
            assert bin((p ^ r.ps[0]) & ((1 << 64) - 1)).count("1") == 1


def test_zero_flips_degenerates_to_single_probe(clustered):
    df, _ = clustered
    queries = df.filter(F.col("vec_id") % 10 == 0)
    single = sorted(
        (r.query_id, r.vec_id, r.cosine, r.rk)
        for r in emb_ops.ann_lsh_topk(df, queries, k=3, band_bits=8).collect()
    )
    multi0 = sorted(
        (r.query_id, r.vec_id, r.cosine, r.rk)
        for r in emb_ops.multiprobe_lsh_topk(
            df, queries, k=3, band_bits=8, n_flips=0
        ).collect()
    )
    assert single == multi0


def test_recall_monotone_and_beats_brute_gate(clustered):
    """Probing only ADDS query-side buckets, so the scored candidate
    set is a superset of single-probe's and recall@k vs brute force
    cannot drop; at n_flips=8 it must clear the 0.8 gate with margin."""
    df, _ = clustered
    queries = df.filter(F.col("vec_id") % 10 == 0)
    brute = {
        (r.query_id, r.vec_id)
        for r in emb_ops.cosine_topk(df, queries, k=2).collect()
    }
    single = {
        (r.query_id, r.vec_id)
        for r in emb_ops.ann_lsh_topk(df, queries, k=2, band_bits=8).collect()
    }
    multi = {
        (r.query_id, r.vec_id)
        for r in emb_ops.multiprobe_lsh_topk(
            df, queries, k=2, band_bits=8, n_flips=8
        ).collect()
    }
    r_single = len(brute & single) / len(brute)
    r_multi = len(brute & multi) / len(brute)
    assert r_multi >= r_single, (r_multi, r_single)
    assert r_multi >= 0.8, f"multi-probe recall@2 {r_multi:.3f} < 0.8"


def test_candidate_superset(clustered):
    """Every single-probe candidate survives into the multi-probe
    candidate relation (same corpus bands, more query bands)."""
    df, _ = clustered
    queries = df.filter(F.col("vec_id") % 10 == 0).limit(5)
    # compare the unranked scored sets at a large k (no truncation)
    big = 10_000
    single = {
        (r.query_id, r.vec_id)
        for r in emb_ops.ann_lsh_topk(
            df, queries, k=big, band_bits=8
        ).collect()
    }
    multi = {
        (r.query_id, r.vec_id)
        for r in emb_ops.multiprobe_lsh_topk(
            df, queries, k=big, band_bits=8, n_flips=8
        ).collect()
    }
    assert single <= multi
    assert len(multi) > len(single)  # probing must actually add some


def test_partition_invariance(clustered):
    df, _ = clustered
    queries = df.filter(F.col("vec_id") % 10 == 0)
    base = sorted(
        tuple(r)
        for r in emb_ops.multiprobe_lsh_topk(
            df, queries, k=3, n_flips=4
        ).collect()
    )
    got = sorted(
        tuple(r)
        for r in emb_ops.multiprobe_lsh_topk(
            df.repartition(13), queries.repartition(3), k=3, n_flips=4
        ).collect()
    )
    assert base == got
