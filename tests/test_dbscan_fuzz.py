"""Seeded fuzz: dbscan_clusters (DataFrame joins/windows/CC) against
an independent pure-Python implementation of the documented
deterministic semantics (sets + BFS) on random integer vectors."""

from __future__ import annotations

import math
import random

from mediaduplicatefinder_spark.operators.dbscan import dbscan_clusters


def _cos6(a, b):
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    if na > 0 and nb > 0:
        return round(sum(x * y for x, y in zip(a, b)) / (na * nb), 6)
    return 0.0


def _py_dbscan(vecs, tau, min_pts):
    """Reference: eps-graph -> closed-neighborhood cores -> BFS CC over
    core-core edges (min-id labels) -> min-rule borders -> noise."""
    ids = sorted(vecs)
    nbrs = {i: set() for i in ids}
    for i in ids:
        for j in ids:
            if i < j and _cos6(vecs[i], vecs[j]) >= tau:
                nbrs[i].add(j)
                nbrs[j].add(i)
    cores = {i for i in ids if len(nbrs[i]) + 1 >= min_pts}
    label = {}
    for i in sorted(cores):
        if i in label:
            continue
        comp, stack = [], [i]
        seen = {i}
        while stack:
            u = stack.pop()
            comp.append(u)
            for v in nbrs[u]:
                if v in cores and v not in seen:
                    seen.add(v)
                    stack.append(v)
        cid = min(comp)
        for u in comp:
            label[u] = cid
    out = {}
    for i in ids:
        if i in cores:
            out[i] = ("core", label[i])
        else:
            adj_cores = [label[v] for v in nbrs[i] if v in cores]
            if adj_cores:
                out[i] = ("border", min(adj_cores))
            else:
                out[i] = ("noise", None)
    return out


def test_fuzz_against_python_reference(spark):
    rng = random.Random(1337)
    for trial in range(6):
        n = rng.randint(5, 24)
        vecs = {
            i: [float(rng.randint(-3, 3)) for _ in range(3)]
            for i in range(n)
        }
        tau = rng.choice([0.5, 0.7, 0.9])
        min_pts = rng.choice([1, 2, 3])
        want = _py_dbscan(vecs, tau, min_pts)
        df = spark.createDataFrame(
            [(i, v) for i, v in vecs.items()],
            "vec_id long, embedding array<double>",
        )
        got = {
            r["vec_id"]: (r["role"], r["cluster_id"])
            for r in dbscan_clusters(df, tau=tau, min_pts=min_pts).collect()
        }
        assert got == want, f"trial {trial} tau={tau} min_pts={min_pts}"
