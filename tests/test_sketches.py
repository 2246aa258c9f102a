"""E75 cardinality sketches: HLL + KMV (operators/sketches.py).

Python replay of both estimators (same integer kernels) + branch
coverage + accuracy + partition invariance.  The DuckDB twin parity is
covered by the driver oracle (`cardinality_sketch`); here we pin the
Spark side against an independent pure-Python replay over the SAME
xxhash64 values, so the two checks meet in the middle.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from mediaduplicatefinder_spark.operators.sketches import (
    HLL_M,
    KMV_K,
    RHO_CAP,
    _ALPHA,
    _EST_NUM,
    _LC_TABLE,
    _LC_THRESHOLD,
    _RHO_EMPTY,
    _VBITS,
    _VMOD,
    cardinality_sketch,
)


def _items_df(spark, groups: dict[str, list[int]]):
    rows = [
        (g, "doc://%010d" % k) for g, keys in groups.items() for k in keys
    ]
    return spark.createDataFrame(rows, "grp string, url string")


def _spark_hashes(spark, urls: list[str]) -> list[int]:
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [
        r.h for r in df.select(F.xxhash64("url").alias("h")).collect()
    ]


def _replay(hashes: list[int]) -> dict:
    """Pure-Python replay of both sketches over signed xxhash64 values."""
    regs: dict[int, int] = {}
    for h in hashes:
        u = h & ((1 << 64) - 1)
        bucket = u >> _VBITS
        v = u % _VMOD
        if v == 0:
            rho = _RHO_EMPTY
        else:
            rho = 1 + (v & -v).bit_length() - 1
        regs[bucket] = max(regs.get(bucket, 0), rho)
    zeros = HLL_M - len(regs)
    zsum = sum(
        1 << (RHO_CAP - min(r, RHO_CAP)) for r in regs.values()
    ) + zeros * (1 << RHO_CAP)
    est_raw = _EST_NUM / zsum
    if est_raw <= _LC_THRESHOLD and zeros > 0:
        hll_est = round(_LC_TABLE[zeros - 1], 6)
    else:
        hll_est = round(est_raw, 6)

    du = sorted({h & ((1 << 64) - 1) for h in hashes})
    n_exact = len(du)
    if n_exact < KMV_K:
        kth, kmv_est = None, float(n_exact)
    else:
        uv = du[KMV_K - 1]
        kth = uv - (1 << 64) if uv >= (1 << 63) else uv
        fuv = float(uv >> 32) * 4294967296.0 + float(uv % 4294967296)
        kmv_est = round(float((KMV_K - 1) * (1 << 64)) / fuv, 6)
    return {
        "n_exact": n_exact,
        "hll_zeros": zeros,
        "hll_zsum": zsum,
        "hll_est": hll_est,
        "kmv_kth": kth,
        "kmv_est": kmv_est,
    }


@pytest.fixture(scope="module")
def sketch_rows(spark):
    # three regimes: tiny (LC + exact-KMV), medium (LC + real KMV),
    # large (raw-HLL branch, zeros likely 0)
    groups = {
        "tiny": [7, 9, 7, 11],  # dups on purpose
        "med": list(range(1000, 1100)),
        "big": list(range(50000, 51000)) * 2,  # every key twice
    }
    out = {
        r["grp"]: r.asDict()
        for r in cardinality_sketch(_items_df(spark, groups)).collect()
    }
    urls = {
        g: ["doc://%010d" % k for k in keys] for g, keys in groups.items()
    }
    return out, {g: _replay(_spark_hashes(spark, u)) for g, u in urls.items()}


def test_replay_parity(sketch_rows):
    got, want = sketch_rows
    assert set(got) == set(want)
    for g in want:
        row = {k: got[g][k] for k in want[g]}
        assert row == want[g], g


def test_branches_live(sketch_rows):
    got, _ = sketch_rows
    # tiny: 3 distinct, LC branch, exact KMV fallback
    assert got["tiny"]["n_exact"] == 3
    assert got["tiny"]["kmv_kth"] is None
    assert got["tiny"]["kmv_est"] == 3.0
    assert got["tiny"]["hll_zeros"] > 0
    # med: real KMV (kth present), LC branch still plausible
    assert got["med"]["kmv_kth"] is not None
    # big: raw-HLL branch — est above the LC threshold
    assert got["big"]["hll_est"] > 2.5 * HLL_M
    assert got["big"]["n_exact"] == 1000  # dup-insensitive


def test_accuracy(sketch_rows):
    got, _ = sketch_rows
    # m=64 HLL: sigma ~ 1.04/8 = 13%; allow 4 sigma. KMV k=32: ~18%.
    for g, n in (("med", 100), ("big", 1000)):
        assert abs(got[g]["hll_est"] - n) / n < 0.52, (g, got[g])
        assert abs(got[g]["kmv_est"] - n) / n < 0.72, (g, got[g])


def test_partition_invariance(spark):
    keys = list(range(777))
    df1 = _items_df(spark, {"g": keys}).repartition(1)
    df13 = _items_df(spark, {"g": keys}).repartition(13)
    r1 = cardinality_sketch(df1).collect()[0].asDict()
    r13 = cardinality_sketch(df13).collect()[0].asDict()
    assert r1 == r13


def test_constants_sane():
    assert _ALPHA == 0.7213 / (1.0 + 1.079 / HLL_M)
    assert len(_LC_TABLE) == HLL_M
    assert _LC_TABLE[0] == HLL_M * math.log(HLL_M)
    assert _RHO_EMPTY == _VBITS + 1


def test_union_merge_equals_direct(spark):
    """Register-wise max of per-snapshot sketches == sketch of the
    union stream (the mergeability property), and the union estimate
    tracks the true union within HLL error."""
    from mediaduplicatefinder_spark.operators.sketches import (
        hll_union_sketch,
    )

    rows = []
    for s in range(3):
        for k in range(s * 120, s * 120 + 240):
            rows.append((s, "g", "doc://%010d" % k))
    df = spark.createDataFrame(rows, "snapshot long, grp string, url string")
    r = hll_union_sketch(df).collect()[0]
    assert r.n_snapshots == 3
    assert r.union_exact == 480  # [0,240)+[120,360)+[240,480)
    assert r.parts_exact_sum == 720  # 3 x 240: overlap visible
    # merged estimate == the direct sketch of the union stream
    direct = cardinality_sketch(
        df.selectExpr("grp", "url")
    ).collect()[0]
    assert (r.hll_zeros, r.hll_zsum, r.hll_est) == (
        direct.hll_zeros,
        direct.hll_zsum,
        direct.hll_est,
    )
    assert abs(r.hll_est - 480) / 480 < 0.52  # 4 sigma at m=64
