"""DBSCAN density clustering (operators/dbscan.py, Ester et al.
KDD'96): core rule, core-growth-only clusters, min-rule border
attachment, full-universe noise rows."""

from __future__ import annotations

from mediaduplicatefinder_spark.operators.dbscan import dbscan_clusters


def _emb_df(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<double>",
    )


def _collect(df):
    return {
        r["vec_id"]: (r["role"], r["cluster_id"]) for r in df.collect()
    }


def test_two_blobs_border_noise(spark):
    # blob A (0-3) hugs e1, blob B (10-13) hugs e2 — dense enough that
    # every member is core; 20 leans toward A but is only eps-adjacent
    # to it (border); 30 is antipodal (noise).
    rows = (
        [(i, [1.0, 0.01 * i, 0.0]) for i in range(4)]
        + [(10 + i, [0.01 * i, 1.0, 0.0]) for i in range(4)]
        + [(20, [0.9, 0.0, 0.9]), (30, [-1.0, -1.0, 0.0])]
    )
    out = _collect(
        dbscan_clusters(_emb_df(spark, rows), tau=0.9, min_pts=3)
    )
    assert len(out) == 10  # full universe
    for i in range(4):
        assert out[i] == ("core", 0)
        assert out[10 + i] == ("core", 10)
    # 20: cos vs blob A members ~0.707+ < 0.9? no — vs [1,0,0] it is
    # 0.9/sqrt(1.62)=0.707, below tau, so 20 is noise here
    assert out[20] == ("noise", None)
    assert out[30] == ("noise", None)


import math


def _angle_rows():
    # two angular arcs of 4 points each (3° apart -> pairwise adjacent
    # at tau=0.88 ~ 28.36°) plus a bridge at 35° that is eps-adjacent
    # ONLY to the nearest arc endpoint on each side (26° gaps; the next
    # members sit 29° away, below tau): the bridge's closed
    # neighborhood is 3 < min_pts=4, so it can never be core
    def v(deg):
        return [math.cos(math.radians(deg)), math.sin(math.radians(deg)), 0.0]

    return (
        [(i, v(3 * i)) for i in range(4)]  # arc A: 0,3,6,9 deg
        + [(10 + i, v(61 + 3 * i)) for i in range(4)]  # arc B: 61..70
        + [(5, v(35.0))]  # bridge
    )


def test_border_attaches_to_min_cluster(spark):
    out = _collect(
        dbscan_clusters(_emb_df(spark, _angle_rows()), tau=0.88, min_pts=4)
    )
    assert out[0] == ("core", 0) and out[10] == ("core", 10)
    role, cid = out[5]
    assert role == "border" and cid == 0  # min of {0, 10}


def test_core_gate_blocks_single_linkage_bridge(spark):
    # the bridge is eps-adjacent to a core in EACH arc but does NOT
    # merge them (clusters grow through cores only) — the exact failure
    # mode plain CC over the eps-graph would exhibit
    out = _collect(
        dbscan_clusters(_emb_df(spark, _angle_rows()), tau=0.88, min_pts=4)
    )
    a_labels = {out[i][1] for i in range(4)}
    b_labels = {out[10 + i][1] for i in range(4)}
    assert a_labels == {0} and b_labels == {10}  # NOT merged


def test_isolated_core_singleton_and_determinism(spark):
    # min_pts=1: every vector is trivially core (closed neighborhood
    # counts itself); a vector with no eps-edges must still form its
    # own singleton cluster, not vanish
    rows = [(0, [1.0, 0.0]), (1, [0.0, 1.0])]
    df = _emb_df(spark, rows)
    out = _collect(dbscan_clusters(df, tau=0.9, min_pts=1))
    assert out == {0: ("core", 0), 1: ("core", 1)}
    # determinism: identical result on a second run
    assert out == _collect(dbscan_clusters(df, tau=0.9, min_pts=1))


def test_sql_twin_matches(spark):
    import duckdb

    from mediaduplicatefinder_spark.operators.dbscan import dbscan_sql

    rows = (
        [(i, [1.0, 0.02 * i, 0.0]) for i in range(5)]
        + [(10 + i, [0.0, 1.0, 0.02 * i]) for i in range(4)]
        + [(20, [0.76, 0.66, 0.0]), (30, [-1.0, 0.5, 3.0])]
    )
    df = _emb_df(spark, rows)
    got = sorted(
        (r["vec_id"], r["role"], r["cluster_id"])
        for r in dbscan_clusters(df, tau=0.65, min_pts=3).collect()
    )
    con = duckdb.connect()
    con.register(
        "embeddings",
        df.toPandas(),
    )
    want = sorted(
        (int(v), str(r), None if c is None else int(c))
        for v, r, c in con.execute(
            dbscan_sql(tau=0.65, min_pts=3)
        ).fetchall()
    )
    assert got == want


def test_pluggable_eps_pairs_relation(spark):
    # an approximate candidate channel that MISSES one edge: the lost
    # edge drops a would-be core to border/noise — the documented
    # under-approximation direction
    from pyspark.sql import functions as F  # noqa: F401

    rows = [(i, [1.0, 0.001 * i]) for i in range(3)]
    df = _emb_df(spark, rows)
    full = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2)], "vec_id_a long, vec_id_b long"
    )
    approx = spark.createDataFrame(
        [(0, 1), (0, 2)], "vec_id_a long, vec_id_b long"
    )
    got_full = _collect(
        dbscan_clusters(df, tau=0.9, min_pts=3, eps_pairs=full)
    )
    got_approx = _collect(
        dbscan_clusters(df, tau=0.9, min_pts=3, eps_pairs=approx)
    )
    assert got_full == {i: ("core", 0) for i in range(3)}
    # 1 and 2 lost their mutual edge: closed neighborhoods drop to 2
    assert got_approx[0] == ("core", 0)
    assert got_approx[1] == ("border", 0)
    assert got_approx[2] == ("border", 0)
