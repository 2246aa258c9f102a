"""E169 D4 (Tirumala et al. 2023) semantics on hand-built vectors.

The driver's DuckDB oracle proves engine-vs-SQL agreement at sf0.01;
here the expected answer is computed independently in numpy (semdedup
+ per-cluster prototype rank + integer cutoff), plus planted cases:
rank 1 is the most prototypical survivor and is dropped first,
semdedup losers carry NULL rank and selected=false, the cutoff is
exact integer arithmetic, and the two-phase rank is invariant to both
partitioning and the rank-bucket count (the E26 exactness proof).
"""

from __future__ import annotations

import numpy as np
import pytest

from mediaduplicatefinder_spark.operators.d4 import d4_selection
from mediaduplicatefinder_spark.operators.semdedup import (
    K_CENTROIDS,
    centroids,
)

DIM = 8
TAU = 0.9
PCT = 30


def _ref_d4(vecs: dict[int, np.ndarray], tau: float, pct: int):
    """Independent numpy reference for the full D4 decision."""
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
    out = {}
    for k in range(K_CENTROIDS):
        members = [v for v in ids if assign[v][0] == k and v not in lost]
        # rank by (cos_centroid desc, vec_id asc); 1-based
        members.sort(key=lambda v: (-assign[v][1], v))
        n_drop = (len(members) * pct) // 100
        for r, vid in enumerate(members, start=1):
            out[vid] = (k, assign[vid][1], True, r, r > n_drop)
    for vid in lost:
        out[vid] = (assign[vid][0], assign[vid][1], False, None, False)
    return out


@pytest.fixture(scope="module")
def planted(spark):
    cents = centroids(DIM, K_CENTROIDS)
    rng = np.random.RandomState(11)
    vecs: dict[int, np.ndarray] = {}
    # cluster-0 ladder: 10 survivors at graded prototypicality (spread
    # far enough apart that none pair above tau) -> with pct=30 the 3
    # most prototypical are pruned.
    for i in range(10):
        vecs[100 + i] = (1.0 - 0.09 * i) * cents[0] + (
            0.09 * i
        ) * rng.standard_normal(DIM)
    # isolated near-dup pair (own cluster): the more prototypical
    # member is a semdedup loser and must NOT consume a rank slot.
    base = cents[6] + 0.03 * rng.standard_normal(DIM)
    vecs[200] = base.copy()
    vecs[201] = 0.8 * base + 0.2 * cents[6]
    # a small far cluster: 2 survivors -> (2*30)//100 = 0 dropped.
    vecs[300] = cents[5] + 0.02 * rng.standard_normal(DIM)
    vecs[301] = cents[5] - 0.4 * rng.standard_normal(DIM)
    # background cloud.
    for i in range(400, 430):
        vecs[i] = rng.standard_normal(DIM)
    df = spark.createDataFrame(
        [(vid, [float(x) for x in v]) for vid, v in sorted(vecs.items())],
        "vec_id long, embedding array<float>",
    )
    vecs32 = {
        vid: np.asarray(v, dtype=np.float32).astype(np.float64)
        for vid, v in vecs.items()
    }
    return df, vecs32


def _run(df, **kw):
    return {
        r["vec_id"]: (
            r["cluster"],
            r["cos_centroid"],
            r["semdedup_keep"],
            r["proto_rank"],
            r["selected"],
        )
        for r in d4_selection(
            df, dim=DIM, tau=TAU, proto_pct=PCT, **kw
        ).collect()
    }


def test_d4_matches_numpy_reference(spark, planted):
    df, vecs = planted
    expected = _ref_d4(vecs, TAU, PCT)
    got = _run(df)
    assert set(got) == set(expected)
    for vid in expected:
        ek, ec, ekeep, erank, esel = expected[vid]
        gk, gc, gkeep, grank, gsel = got[vid]
        assert gk == ek, vid
        assert gc == pytest.approx(ec, abs=2e-6), vid
        assert gkeep == ekeep, vid
        assert grank == erank, vid
        assert gsel == esel, vid


def test_d4_planted_cases(spark, planted):
    df, _ = planted
    got = _run(df)
    # semdedup loser: null rank, never selected.
    losers = [v for v in (200, 201) if not got[v][2]]
    assert len(losers) == 1
    assert got[losers[0]][3] is None and not got[losers[0]][4]
    # ladder cluster: ranks are 1..n with rank 1 = highest cos_centroid,
    # and exactly (n*30)//100 of the survivors are pruned.
    lad = [v for v in got if got[v][0] == got[100][0] and got[v][2]]
    ranks = sorted(got[v][3] for v in lad)
    assert ranks == list(range(1, len(lad) + 1))
    top = min(lad, key=lambda v: got[v][3])
    assert got[top][1] == max(got[v][1] for v in lad)
    n_drop = (len(lad) * PCT) // 100
    assert sum(1 for v in lad if not got[v][4]) == n_drop
    assert all(got[v][4] == (got[v][3] > n_drop) for v in lad)
    # EVERY cluster obeys the integer cutoff: ranks are 1..n over the
    # survivors and exactly (n*30)//100 of them (the top ranks) drop —
    # in particular any 1- or 2-survivor cluster prunes nothing.
    clusters = {got[v][0] for v in got}
    for c in clusters:
        surv = [v for v in got if got[v][0] == c and got[v][2]]
        if not surv:
            continue
        ranks = sorted(got[v][3] for v in surv)
        assert ranks == list(range(1, len(surv) + 1))
        nd = (len(surv) * PCT) // 100
        assert all(got[v][4] == (got[v][3] > nd) for v in surv)
        if len(surv) <= 3:
            assert all(got[v][4] for v in surv)


def test_d4_partition_and_bucket_invariant(spark, planted):
    df, _ = planted
    a = _run(df)
    assert _run(df.repartition(13)) == a
    # the bucket count changes the decomposition, never the answer
    assert _run(df, n_buckets=2) == a
    assert _run(df, n_buckets=5) == a


def test_d4_plan_has_no_cartesian_product(spark, planted):
    df, _ = planted
    plan = (
        d4_selection(df, dim=DIM, tau=TAU, proto_pct=PCT)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
