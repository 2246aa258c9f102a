"""E31 SemDeDup (Abbas et al. 2023) semantics on hand-built vectors.

The driver's DuckDB oracle proves engine-vs-SQL agreement at sf0.01;
here the expected answer is computed independently in numpy, plus
targeted planted cases: identical twins tie-break by vec_id, the
more-prototypical (closer-to-centroid) member of a pair is dropped,
cross-cluster similarity is NOT deduped (the paper's within-cluster
scope), and the result is partition-invariant.
"""

from __future__ import annotations

import numpy as np
import pytest

from mediaduplicatefinder_spark.operators.semdedup import (
    K_CENTROIDS,
    assign_clusters,
    centroids,
    semdedup,
)

DIM = 8
TAU = 0.9


def _ref_semdedup(vecs: dict[int, np.ndarray], tau: float):
    """Independent numpy reference: assignment, within-cluster pairs,
    drop-closer-to-centroid (ties -> higher id), round-6 everywhere."""
    cents = centroids(DIM, K_CENTROIDS)

    def cos(a, b):
        na, nb = np.sqrt(a @ a), np.sqrt(b @ b)
        return round(float(a @ b / (na * nb)) if na > 0 and nb > 0 else 0.0, 6)

    assign = {}
    for vid, v in vecs.items():
        sims = [cos(v, cents[k]) for k in range(K_CENTROIDS)]
        best = max(sims)
        k = min(i for i, s in enumerate(sims) if s == best)
        assign[vid] = (k, sims[k])
    lost = set()
    ids = sorted(vecs)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if assign[a][0] != assign[b][0]:
                continue
            if cos(vecs[a], vecs[b]) < tau:
                continue
            ca, cb = assign[a][1], assign[b][1]
            lost.add(a if ca > cb else b if cb > ca else max(a, b))
    return {
        vid: (assign[vid][0], assign[vid][1], vid not in lost) for vid in ids
    }


@pytest.fixture(scope="module")
def planted(spark):
    cents = centroids(DIM, K_CENTROIDS)
    rng = np.random.RandomState(7)
    vecs: dict[int, np.ndarray] = {}
    # 1, 2: identical direction (cosine 1, equal cos_centroid) -> tie,
    # higher vec_id loses.
    base = cents[0] + 0.05 * rng.standard_normal(DIM)
    vecs[1] = base.copy()
    vecs[2] = 2.0 * base
    # 3: near base but nudged TOWARD the centroid -> more prototypical.
    vecs[3] = 0.7 * base + 0.3 * cents[0]
    # 10, 11: similar to each other but seeded from different centroids
    # (cross-cluster near-dups must both survive).
    vecs[10] = cents[1] + 0.02 * rng.standard_normal(DIM)
    vecs[11] = cents[2] + 0.02 * rng.standard_normal(DIM)
    # 20: isolated singleton.
    vecs[20] = cents[3] + 0.5 * rng.standard_normal(DIM)
    # 30..49: random background cloud.
    for i in range(30, 50):
        vecs[i] = rng.standard_normal(DIM)
    df = spark.createDataFrame(
        [(vid, [float(x) for x in v]) for vid, v in sorted(vecs.items())],
        "vec_id long, embedding array<float>",
    )
    # createDataFrame stores float32; the reference must see the same
    # storage-precision values the engine reads back.
    vecs32 = {
        vid: np.asarray(v, dtype=np.float32).astype(np.float64)
        for vid, v in vecs.items()
    }
    return df, vecs32


def test_semdedup_matches_numpy_reference(spark, planted):
    df, vecs = planted
    expected = _ref_semdedup(vecs, TAU)
    got = {
        r["vec_id"]: (r["cluster"], r["cos_centroid"], r["keep"])
        for r in semdedup(df, dim=DIM, tau=TAU).collect()
    }
    assert set(got) == set(expected)
    for vid in expected:
        ek, ec, ekeep = expected[vid]
        gk, gc, gkeep = got[vid]
        assert gk == ek, vid
        assert gc == pytest.approx(ec, abs=2e-6), vid
        assert gkeep == ekeep, vid


def test_semdedup_planted_cases(spark, planted):
    df, vecs = planted
    got = {
        r["vec_id"]: r for r in semdedup(df, dim=DIM, tau=TAU).collect()
    }
    # identical-direction twins: same cluster, equal cos_centroid, the
    # HIGHER vec_id loses the tie.
    assert got[1]["cluster"] == got[2]["cluster"]
    assert got[1]["cos_centroid"] == got[2]["cos_centroid"]
    assert got[1]["keep"] and not got[2]["keep"]
    # 3 is closer to its centroid than 1 -> 3 is the prototypical one
    # and gets dropped, the outlier 1 survives (the paper's rule).
    assert got[3]["cluster"] == got[1]["cluster"]
    assert got[3]["cos_centroid"] > got[1]["cos_centroid"]
    assert not got[3]["keep"]
    # cross-cluster near-dups both survive.
    assert got[10]["cluster"] != got[11]["cluster"]
    assert got[10]["keep"] and got[11]["keep"]
    # singleton survives.
    assert got[20]["keep"]


def test_semdedup_partition_invariant(spark, planted):
    df, _ = planted
    a = sorted(map(tuple, semdedup(df, dim=DIM, tau=TAU).collect()))
    b = sorted(
        map(
            tuple,
            semdedup(df.repartition(13), dim=DIM, tau=TAU).collect(),
        )
    )
    assert a == b


def test_semdedup_plan_has_no_cartesian_product(spark, planted):
    df, _ = planted
    plan = semdedup(df, dim=DIM, tau=TAU)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_assign_clusters_tie_breaks_to_lowest_index(spark):
    # the zero vector has cosine 0.0 to every centroid -> all ties ->
    # cluster 0 by the lowest-index rule in both engines.
    df = spark.createDataFrame(
        [(0, [0.0] * DIM)], "vec_id long, embedding array<float>"
    )
    row = assign_clusters(df, dim=DIM).collect()[0]
    assert row["cluster"] == 0
    assert row["cos_centroid"] == 0.0
