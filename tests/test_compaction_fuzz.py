"""E147/E152 fuzz: hypothesis-generated manifests vs the pure-python
next-fit reference, and salted joins vs the plain join on random skew
layouts."""

from __future__ import annotations

import pytest

try:
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover
    pytest.skip("hypothesis not installed", allow_module_level=True)

from mediaduplicatefinder_spark.operators.compaction import compaction_plan
from mediaduplicatefinder_spark.operators.skew import salted_join

TARGET, SMALL = 1000, 500

manifests = st.lists(
    st.tuples(
        st.sampled_from(["p0", "p1"]),
        st.integers(0, 9999),
        st.integers(1, 2000),
    ),
    min_size=1,
    max_size=16,
    unique_by=lambda t: (t[0], t[1]),
)


def _ref(rows):
    out = {}
    parts: dict = {}
    for part, path, size in rows:
        if size >= SMALL:
            out[path] = (part, size, -1, 1, size, "keep")
        else:
            parts.setdefault(part, []).append((path, size))
    for part, fs in parts.items():
        fs.sort(key=lambda x: (-x[1], x[0]))
        prefix, bins = 0, {}
        for path, size in fs:
            bins.setdefault(prefix // TARGET, []).append((path, size))
            prefix += size
        for b, members in bins.items():
            total = sum(s for _, s in members)
            act = "compact" if len(members) >= 2 else "keep"
            for path, size in members:
                out[path] = (part, size, b, len(members), total, act)
    return out


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=manifests)
def test_compaction_fuzz(spark, rows):
    named = [(p, f"{p}-f{i:04d}.pq", s) for p, i, s in rows]
    df = spark.createDataFrame(
        named, "part string, path string, size_bytes long"
    )
    got = {
        r["path"]: (r["part"], r["size_bytes"], r["bin"], r["bin_files"],
                    r["bin_bytes"], r["action"])
        for r in compaction_plan(df, "part", TARGET, SMALL).collect()
    }
    assert got == _ref(named)


joins = st.lists(
    st.tuples(st.sampled_from(["hot", "c1", "c2", "c3"]), st.integers(0, 99)),
    min_size=0,
    max_size=20,
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(lrows=joins, n_salt=st.integers(1, 6))
def test_salted_join_fuzz(spark, lrows, n_salt):
    left = spark.createDataFrame(
        lrows or [("zz", 0)], "k string, payload long"
    )
    if not lrows:
        left = left.filter("payload < 0")
    right = spark.createDataFrame(
        [("hot", "H"), ("c1", "C1"), ("c3", "C3")], "k string, dim string"
    )
    got = sorted(map(tuple, salted_join(left, right, "k", n_salt).collect()))
    want = sorted(map(tuple, left.join(right, "k", "inner").collect()))
    assert got == want
