"""E185 k-center greedy: exact trajectory vs a numpy farthest-first
reference, non-increasing radius curve, the 2-approximation spirit
(planted clusters get one center each before any cluster gets two),
k > n degeneration, and partition invariance."""

from __future__ import annotations

import numpy as np
import pytest

from mediaduplicatefinder_spark.operators.kcenter import kcenter_greedy


def _emb_df(spark, vecs, parts=4):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).repartition(parts)


def _py_greedy(vecs, k):
    vs = [np.asarray(v, dtype=np.float32).astype(np.float64) for v in vecs]

    def cos6(a, b):
        na, nb = np.sqrt(a @ a), np.sqrt(b @ b)
        if na <= 0 or nb <= 0:
            return 0.0
        return round(float(a @ b) / float(na * nb), 6)

    sel = [0]
    md = [1.0 - cos6(v, vs[0]) for v in vs]
    out = [(0, 0, None)]
    for r in range(1, min(k, len(vs))):
        best = max(
            (m, -i) for i, m in enumerate(md) if i not in set(sel)
        )
        pick = -best[1]
        out.append((r, pick, best[0]))
        sel.append(pick)
        md = [min(m, 1.0 - cos6(vs[i], vs[pick])) for i, m in enumerate(md)]
    return out


@pytest.fixture(scope="module")
def clustered():
    rng = np.random.default_rng(21)
    centers = rng.normal(size=(4, 20)) * 5
    return [
        (centers[i % 4] + rng.normal(size=20) * 0.2).astype(np.float32)
        for i in range(60)
    ]


def test_matches_python_reference(spark, clustered):
    got = [
        (r["round"], r["vec_id"], r["radius"])
        for r in kcenter_greedy(_emb_df(spark, clustered), k=8)
        .orderBy("round")
        .collect()
    ]
    ref = _py_greedy(clustered, 8)
    assert [(a, b) for a, b, _ in got] == [(a, b) for a, b, _ in ref]
    for (_r, _v, g), (_r2, _v2, e) in zip(got[1:], ref[1:]):
        assert abs(g - e) < 1e-9


def test_radius_non_increasing(spark, clustered):
    rows = (
        kcenter_greedy(_emb_df(spark, clustered), k=10)
        .orderBy("round")
        .collect()
    )
    radii = [r["radius"] for r in rows[1:]]
    assert all(a >= b - 1e-12 for a, b in zip(radii, radii[1:]))


def test_covers_clusters_before_densifying(spark, clustered):
    # 4 planted clusters: the first 4 picks must hit 4 DISTINCT
    # clusters (farthest-first spans before it densifies)
    rows = (
        kcenter_greedy(_emb_df(spark, clustered), k=4)
        .orderBy("round")
        .collect()
    )
    assert len({r["vec_id"] % 4 for r in rows}) == 4


def test_k_exceeds_n(spark):
    vecs = [[1.0, 0.0], [0.0, 1.0], [1.0, 1.0]]
    rows = kcenter_greedy(_emb_df(spark, vecs), k=10).collect()
    assert len(rows) == 3
    assert {r["vec_id"] for r in rows} == {0, 1, 2}


def test_partition_invariance(spark, clustered):
    def run(parts):
        return sorted(
            map(
                tuple,
                kcenter_greedy(_emb_df(spark, clustered, parts), k=6)
                .collect(),
            )
        )

    assert run(1) == run(9)


def test_string_id_column(spark):
    # review r5: the output schema must follow id_col's type, not a
    # hardcoded long
    from mediaduplicatefinder_spark.operators.kcenter import kcenter_greedy

    rows = [(f"u{i}", [float(i), 1.0, 0.0]) for i in range(6)]
    df = spark.createDataFrame(rows, "url string, embedding array<float>")
    out = kcenter_greedy(df, k=3, id_col="url").collect()
    assert len(out) == 3
    assert all(isinstance(r["vec_id"], str) for r in out)
