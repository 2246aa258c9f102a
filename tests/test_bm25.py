"""E140 BM25 top-k retrieval: pure-Python reference parity on a
hand-built corpus, ranking semantics (rare-term idf dominance,
self-exclusion, tie order), partition invariance, and the DuckDB
twin."""

from __future__ import annotations

import math
from decimal import Decimal, ROUND_HALF_UP

import pytest

from mediaduplicatefinder_spark.operators.bm25 import bm25_topk, bm25_topk_sql


def _r8(x: float) -> Decimal:
    return Decimal(repr(x)).quantize(Decimal("0.00000001"), ROUND_HALF_UP)


def _ref_bm25(docs: dict[int, list[str]], query_mod: int, q_terms: int, k: int):
    """The operator's exact contract in pure Python: integer tf/dl/S/N,
    round8-decimal idf, single-division saturation, decimal sums."""
    tf = {d: {} for d in docs}
    for d, toks in docs.items():
        for t in toks:
            tf[d][t] = tf[d].get(t, 0) + 1
    dl = {d: len(toks) for d, toks in docs.items() if toks}
    S = sum(dl.values())
    N = len(dl)
    out = {}
    for qid in sorted(docs):
        if qid % query_mod or not docs[qid]:
            continue
        seen, terms = set(), []
        for t in docs[qid]:
            if t not in seen:
                seen.add(t)
                terms.append(t)
        terms = sorted(terms[:q_terms]) if False else terms[:q_terms]
        pair = {}
        for t in terms:
            df = sum(1 for d in tf if t in tf[d])
            if not df:
                continue
            idf = _r8(math.log(1 + (N - df + 0.5) / (df + 0.5)))
            for d in tf:
                if d == qid or t not in tf[d]:
                    continue
                f = tf[d][t]
                sat = float(22 * f * S) / float(10 * f * S + 3 * S + 9 * dl[d] * N)
                pair[d] = pair.get(d, Decimal(0)) + _r8(float(idf) * sat)
        ranked = sorted(pair.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        out[qid] = [(d, s) for d, s in ranked]
    return out


@pytest.fixture(scope="module")
def corpus():
    # doc 0 is the query (mod 100): terms zebra quark mango zebra ->
    # query = [zebra, quark, mango] (first-occurrence order, 3 < q_terms)
    return {
        0: "zebra quark mango zebra".split(),
        1: "zebra zebra zebra filler words here".split(),
        2: "quark mango filler filler filler".split(),
        3: "mango mango mango mango mango mango".split(),
        4: "filler words only nothing shared".split(),
        5: "zebra quark mango exact overlap".split(),
        6: [],  # empty doc: no postings, never scored, not in N
    }


@pytest.fixture(scope="module")
def docs_df(spark, corpus):
    rows = [(d, " ".join(t)) for d, t in corpus.items()]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_matches_python_reference(spark, corpus, docs_df):
    want = _ref_bm25(corpus, query_mod=100, q_terms=4, k=10)
    got = bm25_topk(docs_df, k=10, query_mod=100, q_terms=4).collect()
    byq = {}
    for r in got:
        byq.setdefault(r["query_id"], []).append(
            (r["rk"], r["doc_id"], r["score"])
        )
    assert set(byq) == set(want)
    for qid, ranked in want.items():
        mine = [(d, s) for _, d, s in sorted(byq[qid])]
        assert mine == [(d, float(s)) for d, s in ranked]
        assert [rk for rk, _, _ in sorted(byq[qid])] == list(
            range(1, len(ranked) + 1)
        )


def test_ranking_semantics(spark, corpus, docs_df):
    got = bm25_topk(docs_df, k=10, query_mod=100).collect()
    ranked = [r["doc_id"] for r in sorted(got, key=lambda r: r["rk"])]
    # self never appears; doc 4 shares no query term; doc 6 is empty
    assert 0 not in ranked and 4 not in ranked and 6 not in ranked
    # doc 5 matches all three query terms -> it must beat the
    # single-term docs
    assert ranked[0] == 5


def test_min_len_filter(spark):
    # tokens shorter than 3 chars never enter the index: a doc of only
    # short tokens has no postings and a query of them retrieves nothing
    df = spark.createDataFrame(
        [(0, "ab cd ef gh"), (1, "ab cd xy zw"), (2, "real tokens here")],
        "doc_id long, text string",
    )
    assert bm25_topk(df, k=5, query_mod=100).count() == 0


def test_partition_invariance(spark, docs_df):
    a = bm25_topk(docs_df, k=10, query_mod=100).collect()
    b = bm25_topk(docs_df.repartition(5), k=10, query_mod=100).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_sql_twin_parity(spark, tmp_path):
    import duckdb

    # a larger deterministic corpus with shared vocab and varied dl
    words = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
    rows = []
    for i in range(60):
        toks = [words[(i * 7 + j * 3) % len(words)] for j in range(3 + i % 9)]
        rows.append((i, " ".join(toks)))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    p = str(tmp_path / "docs.parquet")
    df.write.mode("overwrite").parquet(p)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM parquet_scan('{p}/*.parquet')"
    )
    want = sorted(
        map(tuple, con.execute(bm25_topk_sql(k=5, query_mod=20)).fetchall())
    )
    got = sorted(
        (r["query_id"], r["doc_id"], r["score"], r["rk"])
        for r in bm25_topk(df, k=5, query_mod=20).collect()
    )
    assert got == want
