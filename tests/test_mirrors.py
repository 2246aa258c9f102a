"""E112 cross-host mirror detection (operators/mirrors.py)."""

from __future__ import annotations

from mediaduplicatefinder_spark.operators.mirrors import mirror_host_pairs


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "host string, doc_id long, text string")
    return {
        (r.host_a, r.host_b): r
        for r in mirror_host_pairs(df, **kw).collect()
    }


def test_full_and_partial_mirror(spark):
    rows = (
        [("a", i, f"body {i}") for i in range(4)]
        + [("b", 10 + i, f"body {i}") for i in range(4)]  # full mirror of a
        + [("c", 20 + i, f"body {i}") for i in range(2)]  # half of a
        + [("c", 25, "own page"), ("c", 26, "another own page")]
    )
    got = _run(spark, rows)
    ab = got[("a", "b")]
    assert (ab.shared, ab.n_a, ab.n_b, ab.is_mirror) == (4, 4, 4, True)
    ac = got[("a", "c")]
    # 2 shared of min(4,4) -> exactly half -> mirror at the boundary
    assert (ac.shared, ac.is_mirror) == (2, True)


def test_weak_overlap_not_mirror(spark):
    rows = (
        [("a", i, f"a{i}") for i in range(5)]
        + [("b", 10 + i, f"b{i}") for i in range(5)]
        + [("a", 6, "one shared notice"), ("b", 16, "one shared notice")]
    )
    got = _run(spark, rows)
    r = got[("a", "b")]
    assert (r.shared, r.is_mirror) == (1, False)


def test_host_cap_drops_universal_content(spark):
    # the same parked-domain text on 5 hosts with cap 4: no pairs at all
    rows = [(f"h{i}", i, "parked domain notice") for i in range(5)]
    got = _run(spark, rows, host_cap=4)
    assert got == {}
    # under the cap the pairs appear
    got2 = _run(spark, rows[:3], host_cap=4)
    assert len(got2) == 3


def test_within_host_duplicates_count_once(spark):
    rows = [
        ("a", 1, "same"),
        ("a", 2, "same"),  # re-post on the same host
        ("b", 3, "same"),
        ("b", 4, "other"),
    ]
    got = _run(spark, rows)
    r = got[("a", "b")]
    # distinct (host, sha): a has n=1, shared=1 -> mirror of the smaller
    assert (r.shared, r.n_a, r.n_b, r.is_mirror) == (1, 1, 2, True)


def _py_mirrors(rows, host_cap=16):
    import hashlib
    from collections import defaultdict

    post = {
        (h, hashlib.sha256(t.encode()).hexdigest()) for h, _i, t in rows
    }
    by_sha = defaultdict(set)
    for h, s in post:
        by_sha[s].add(h)
    keep = {(h, s) for h, s in post if len(by_sha[s]) <= host_cap}
    sizes = defaultdict(int)
    for h, _s in keep:
        sizes[h] += 1
    shared = defaultdict(int)
    for s, hosts in by_sha.items():
        hs = sorted(x for x in hosts if (x, s) in keep)
        for i, a in enumerate(hs):
            for b in hs[i + 1:]:
                shared[(a, b)] += 1
    return {
        k: (v, sizes[k[0]], sizes[k[1]], 2 * v >= min(sizes[k[0]], sizes[k[1]]))
        for k, v in shared.items()
    }


def test_seeded_fuzz_vs_python_reference(spark):
    import random

    rng = random.Random(3)
    rows = []
    i = 0
    for h in range(6):
        for d in range(12):
            # half the texts come from a small shared pool -> rich overlap
            if rng.random() < 0.5:
                t = f"shared {rng.randint(0, 9)}"
            else:
                t = f"own {h} {d}"
            rows.append((f"h{h}", i, t))
            i += 1
    want = _py_mirrors(rows)
    df = spark.createDataFrame(rows, "host string, doc_id long, text string")
    got = {
        (r.host_a, r.host_b): (r.shared, r.n_a, r.n_b, r.is_mirror)
        for r in mirror_host_pairs(df).collect()
    }
    assert got == want
