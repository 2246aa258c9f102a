"""Cluster cohesion audit (operators/cohesion.py, E161) — hand-built
chain vs clique matrix, truncation branch, python aggregation
reference with the same round-8 discipline."""

from __future__ import annotations

import itertools
from decimal import Decimal

from mediaduplicatefinder_spark.operators.cohesion import cluster_cohesion


def _clusters_df(spark, rows):
    return spark.createDataFrame(rows, "url string, cluster_id string, kind string")


def _tokens_df(spark, sets):
    rows = [(u, sorted(s)) for u, s in sets.items()]
    return spark.createDataFrame(rows, "url string, th array<int>")


def _ref(members, sets, t=0.6, cap=64):
    out = {}
    by_c = {}
    for u, c in members:
        by_c.setdefault(c, []).append(u)
    for c, us in by_c.items():
        us = sorted(us)
        if len(us) < 2:
            continue
        aud = us[:cap]
        js = []
        for a, b in itertools.combinations(aud, 2):
            sa, sb = set(sets[a]), set(sets[b])
            union = len(sa | sb)
            js.append(round(len(sa & sb) / union, 8) if union else 0.0)
        # the engine contract: DECIMAL(12,8) values summed EXACTLY,
        # one double cast, one IEEE division — not a float running sum
        dec_sum = sum(Decimal(f"{j:.8f}") for j in js)
        out[c] = {
            "n_members": len(us),
            "truncated": len(us) > cap,
            "n_pairs": len(js),
            "min_jaccard": min(js),
            "mean_jaccard": float(dec_sum) / len(js),
            "n_below": sum(1 for j in js if j < t),
        }
    return out


def test_chain_vs_clique(spark):
    # clique c1: three near-identical sets (all pairs J > 0.6)
    # chain  c2: A~B and B~C above threshold, A~C far below
    sets = {
        "a1": set(range(10)),
        "a2": set(range(10)) - {0} | {100},
        "a3": set(range(10)) - {1} | {101},
        "b1": set(range(0, 10)),          # B left end
        "b2": set(range(3, 13)),          # middle: J(b1,b2)=7/13≈0.538?
        "b3": set(range(6, 16)),
    }
    # make the chain edges actually strong: overlap 8 of 12 -> 8/12=0.667
    sets["b2"] = set(range(2, 12))
    # J(b1,b2) = 8/12 = 0.6667 > 0.6; J(b2,b3)=|6..11|=6/14? tweak b3:
    sets["b3"] = set(range(4, 14))  # J(b2,b3)=8/12=0.6667; J(b1,b3)=6/14=0.4286
    members = [("a1", "c1"), ("a2", "c1"), ("a3", "c1"),
               ("b1", "c2"), ("b2", "c2"), ("b3", "c2")]
    clusters = _clusters_df(
        spark, [(u, c, "SIMILAR") for u, c in members] + [("x", "c9", "EXACT")]
    )
    sets["x"] = {1, 2, 3}
    got = {
        r.cluster_id: r.asDict()
        for r in cluster_cohesion(clusters, _tokens_df(spark, sets)).collect()
    }
    want = _ref(members, sets)
    assert set(got) == set(want)  # EXACT kind rows never audited
    for c in want:
        for k, v in want[c].items():
            assert got[c][k] == v, (c, k, got[c][k], v)
    assert got["c1"]["n_below"] == 0 and got["c1"]["min_jaccard"] > 0.6
    assert got["c2"]["n_below"] == 1 and got["c2"]["min_jaccard"] < 0.5


def test_truncation_branch(spark):
    sets = {f"u{i}": set(range(20)) | {1000 + i} for i in range(6)}
    members = [(f"u{i}", "big") for i in range(6)]
    clusters = _clusters_df(spark, [(u, c, "SIMILAR") for u, c in members])
    got = cluster_cohesion(
        clusters, _tokens_df(spark, sets), max_exact=3
    ).collect()[0]
    assert got.truncated and got.n_members == 6 and got.n_pairs == 3  # C(3,2)
    want = _ref(members, sets, cap=3)["big"]
    assert got.min_jaccard == want["min_jaccard"]
    assert got.mean_jaccard == want["mean_jaccard"]


def test_partition_invariance(spark):
    sets = {f"d{i}": set(range(i, i + 12)) for i in range(8)}
    members = [(f"d{i}", "c0") for i in range(4)] + [
        (f"d{i}", "c1") for i in range(4, 8)
    ]
    clusters = _clusters_df(spark, [(u, c, "SIMILAR") for u, c in members])
    toks = _tokens_df(spark, sets)
    outs = []
    for parts in (1, 7):
        rows = cluster_cohesion(
            clusters.repartition(parts), toks.repartition(parts)
        ).collect()
        outs.append({r.cluster_id: r.asDict() for r in rows})
    assert outs[0] == outs[1]
    want = _ref(members, sets)
    assert set(outs[0]) == set(want)
    for c in want:
        for k, v in want[c].items():
            assert outs[0][c][k] == v, (c, k)
