"""Medoid election (operators/cohesion.py cluster_medoids, E166) —
hand-built chain/star matrices where the medoid is NOT the keeper-
priority pick, tie-break rule, truncation branch, python reference
with the same round-8 DECIMAL totals."""

from __future__ import annotations

from decimal import Decimal

from mediaduplicatefinder_spark.operators.cohesion import cluster_medoids


def _clusters_df(spark, rows):
    return spark.createDataFrame(
        rows, "url string, cluster_id string, kind string"
    )


def _tokens_df(spark, sets):
    rows = [(u, sorted(s)) for u, s in sets.items()]
    return spark.createDataFrame(rows, "url string, th array<int>")


def _ref(members, sets, cap=64):
    out = {}
    by_c = {}
    for u, c in members:
        by_c.setdefault(c, []).append(u)
    for c, us in by_c.items():
        us = sorted(us)
        if len(us) < 2:
            continue
        aud = us[:cap]
        tot = {}
        for a in aud:
            s = Decimal(0)
            for b in aud:
                if a == b:
                    continue
                sa, sb = set(sets[a]), set(sets[b])
                union = len(sa | sb)
                j = round(len(sa & sb) / union, 8) if union else 0.0
                s += Decimal(f"{j:.8f}")
            tot[a] = s
        # argmax by exact decimal total, ties -> lowest url
        medoid = min(tot, key=lambda u: (-tot[u], u))
        out[c] = {
            "n_members": len(us),
            "truncated": len(us) > cap,
            "medoid_url": medoid,
            "medoid_total": float(tot[medoid]),
            "medoid_mean": float(tot[medoid]) / (len(aud) - 1),
        }
    return out


def _run(spark, members, sets, cap=64):
    got = cluster_medoids(
        _clusters_df(spark, [(u, c, "SIMILAR") for u, c in members]),
        _tokens_df(spark, sets),
        max_exact=cap,
    ).collect()
    return {r.cluster_id: r.asDict() for r in got}


def test_chain_and_star(spark):
    """In a chain A-B-C the middle member shares the most with both
    ends — the medoid — while lowest-url order would pick A; in a star
    the hub wins even when it sorts last. The election must follow
    similarity structure, not ordering."""
    sets = {
        # chain c1: ends overlap the middle heavily, each other less
        "a_end1": set(range(0, 10)),
        "b_mid": set(range(2, 12)),
        "c_end2": set(range(4, 14)),
        # star c2: hub shares with every spoke, spokes share only hub
        "h_spoke1": set(range(0, 8)) | {100},
        "i_spoke2": set(range(0, 8)) | {200},
        "z_hub": set(range(0, 8)),
    }
    members = [
        ("a_end1", "c1"), ("b_mid", "c1"), ("c_end2", "c1"),
        ("h_spoke1", "c2"), ("i_spoke2", "c2"), ("z_hub", "c2"),
    ]
    got = _run(spark, members, sets)
    ref = _ref(members, sets)
    assert set(got) == set(ref)
    for c in ref:
        for k, v in ref[c].items():
            assert got[c][k] == v, (c, k, got[c][k], v)
    # the chain's medoid is the middle doc, NOT the lexicographic first
    assert got["c1"]["medoid_url"] == "b_mid"
    # the star's medoid is the hub even though it sorts LAST
    assert got["c2"]["medoid_url"] == "z_hub"


def test_tie_breaks_to_lowest_url(spark):
    # two identical sets: totals tie exactly; lowest url must win
    sets = {
        "m2": set(range(5)),
        "m1": set(range(5)),
    }
    members = [("m1", "c"), ("m2", "c")]
    got = _run(spark, members, sets)
    assert got["c"]["medoid_url"] == "m1"
    assert got["c"]["medoid_total"] == 1.0
    assert got["c"]["medoid_mean"] == 1.0


def test_truncation_branch(spark):
    # 5 members, cap 3: only the 3 lowest urls are audited; the medoid
    # comes from the audited sample and truncated flags it
    sets = {f"u{i}": set(range(i, i + 10)) for i in range(5)}
    members = [(f"u{i}", "c") for i in range(5)]
    got = _run(spark, members, sets, cap=3)
    ref = _ref(members, sets, cap=3)
    assert {k: got["c"][k] for k in ref["c"]} == ref["c"]
    assert got["c"]["truncated"] is True
    assert got["c"]["n_members"] == 5
    assert got["c"]["medoid_url"] in {"u0", "u1", "u2"}


def test_singleton_and_exact_clusters_excluded(spark):
    sets = {"a": set(range(5)), "b": set(range(5)), "c": set(range(5))}
    rows = [("a", "c1", "SIMILAR"), ("b", "c2", "EXACT"), ("c", "c2", "EXACT")]
    got = cluster_medoids(
        _clusters_df(spark, rows), _tokens_df(spark, sets)
    ).collect()
    assert got == []


def test_partition_invariance(spark):
    sets = {f"d{i:02d}": set(range(i % 7, i % 7 + 12)) for i in range(24)}
    members = [(f"d{i:02d}", f"c{i % 3}") for i in range(24)]
    base = _run(spark, members, sets)
    cdf = _clusters_df(
        spark, [(u, c, "SIMILAR") for u, c in members]
    ).repartition(7)
    tdf = _tokens_df(spark, sets).repartition(5)
    got = {
        r.cluster_id: r.asDict()
        for r in cluster_medoids(cdf, tdf).collect()
    }
    assert got == base
