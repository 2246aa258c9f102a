"""E146 as-of join fuzz: hypothesis-generated key/timestamp layouts
(duplicate left timestamps, dense version ties, empty sides, sparse
keys) vs the pure-python reference — the r4s5 fuzz pattern applied to
the temporal operator, where off-by-one tie handling hides."""

from __future__ import annotations

import pytest

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

from mediaduplicatefinder_spark.operators.asof import asof_join

KEYS = ["k0", "k1", "k2"]


def _ref(left, right, tol):
    out = {}
    for lid, k, ts in left:
        cand = [(rts, p) for rk, rts, p in right if rk == k and rts <= ts]
        if not cand:
            out[lid] = (None, None, False)
        else:
            rts, p = max(cand)
            out[lid] = (rts, p, False if tol is None else ts - rts > tol)
    return out


lefts = st.lists(
    st.tuples(st.sampled_from(KEYS), st.integers(0, 60)),
    min_size=0,
    max_size=14,
)
# distinct (key, ts) on the right: the operator's documented contract
rights = st.lists(
    st.tuples(st.sampled_from(KEYS), st.integers(0, 60)),
    min_size=0,
    max_size=10,
    unique=True,
)
tols = st.one_of(st.none(), st.integers(0, 30))


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(lefts=lefts, rights=rights, tol=tols)
def test_fuzz_matches_reference(spark, lefts, rights, tol):
    left = [(i, k, ts) for i, (k, ts) in enumerate(lefts)]
    right = [(k, ts, f"{k}@{ts}") for k, ts in rights]
    l = spark.createDataFrame(
        left or [(0, "zz", 0)], "event_id long, k string, ts long"
    )
    if not left:
        l = l.filter("event_id < 0")
    r = spark.createDataFrame(
        right or [("zz", 0, "p")], "k string, ts long, policy string"
    )
    if not right:
        r = r.filter("ts < 0")
    got = {
        row["event_id"]: (row["matched_ts"], row["policy"], row["stale"])
        for row in asof_join(l, r, "k", "ts", ["policy"], tolerance=tol).collect()
    }
    assert got == _ref(left, right, tol)
