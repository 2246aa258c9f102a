"""E139 product-quantization ADC top-k: codeword-exact corpus parity,
a full numpy reference of the integer contract, trained-codebook
recall vs the exact baseline, partition invariance, and the DuckDB
twin."""

from __future__ import annotations

import numpy as np
import pytest

from mediaduplicatefinder_spark.operators.kmeans import DEFAULT_SCALE
from mediaduplicatefinder_spark.operators.pq import (
    encode_pq,
    init_codebooks,
    pq_adc_topk,
    pq_adc_topk_sql,
    train_codebooks,
)

DIM = 16
M = 4
KS = 8
N = 300
K = 5
SUB = DIM // M


def _quant(v: np.ndarray) -> np.ndarray:
    """round-half-away(e * SCALE) over the float32->float64 cast —
    the Spark/DuckDB shared quantization."""
    x = v.astype(np.float32).astype(np.float64) * DEFAULT_SCALE
    return np.trunc(x + np.sign(x) * 0.5).astype(np.int64)


def _ref_codes(q: np.ndarray, cbs) -> list[int]:
    out = []
    for mi in range(len(cbs)):
        sl = q[mi * SUB : (mi + 1) * SUB]
        d = [int(((sl - np.array(cw)) ** 2).sum()) for cw in cbs[mi]]
        out.append(int(np.argmin(d)))  # argmin ties -> lowest j
    return out


def _ref_adc(qq: np.ndarray, codes: list[int], cbs) -> int:
    return sum(
        int(((qq[mi * SUB : (mi + 1) * SUB] - np.array(cbs[mi][codes[mi]])) ** 2).sum())
        for mi in range(len(cbs))
    )


@pytest.fixture(scope="module")
def emb(spark):
    # clustered corpus (the test_ivf pattern): meaningful codebooks
    # need structure, pure noise makes any quantizer useless. 60 tight
    # anchors — PQ resolves BETWEEN clusters; within a dense cluster
    # ADC is cluster-resolution by construction (Jegou §V measures
    # recall@R for exactly this reason).
    rng = np.random.RandomState(77)
    anchors = rng.standard_normal((60, DIM)) * 0.5
    rows = []
    for i in range(N):
        v = anchors[i % 60] + 0.05 * rng.standard_normal(DIM)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_codeword_corpus_is_exact(spark):
    """Vectors that ARE codeword concatenations encode losslessly, and
    ADC == the exact integer L2 between query and corpus vector."""
    cbs = init_codebooks(DIM, M, KS)
    rng = np.random.RandomState(5)
    rows, planted = [], []
    for i in range(40):
        picks = [int(rng.randint(KS)) for _ in range(M)]
        vec = [c / DEFAULT_SCALE for mi in range(M) for c in cbs[mi][picks[mi]]]
        rows.append((i, [float(x) for x in vec]))
        planted.append(picks)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {r["vec_id"]: list(r["codes"]) for r in encode_pq(df, DIM, cbs, M, KS).collect()}
    # lossless encode modulo duplicate codewords: the decoded codeword
    # must equal the planted one (indices can differ only on exact ties)
    for i, picks in enumerate(planted):
        for mi in range(M):
            assert cbs[mi][got[i][mi]] == cbs[mi][picks[mi]]
    top = pq_adc_topk(df, df.filter("vec_id < 3"), DIM, k=39, codebooks=cbs, m=M, ks=KS)
    qs = {r[0]: _quant(np.array(r[1])) for r in rows}
    for r in top.collect():
        exact = int(((qs[r["query_id"]] - qs[r["vec_id"]]) ** 2).sum())
        assert r["adc"] == exact


def test_matches_numpy_reference(spark, emb):
    cbs = init_codebooks(DIM, M, KS)
    queries = emb.filter("vec_id % 40 = 0")
    rows = {r["vec_id"]: np.array(r["embedding"]) for r in emb.collect()}
    got = pq_adc_topk(emb, queries, DIM, k=K, codebooks=cbs, m=M, ks=KS).collect()
    codes = {i: _ref_codes(_quant(v), cbs) for i, v in rows.items()}
    for qid in [i for i in rows if i % 40 == 0]:
        qq = _quant(rows[qid])
        scored = sorted(
            (_ref_adc(qq, codes[i], cbs), i) for i in rows if i != qid
        )[:K]
        mine = sorted(
            (r["adc"], r["vec_id"], r["rk"]) for r in got if r["query_id"] == qid
        )
        assert [(a, v) for a, v, _ in mine] == scored
        assert [rk for _, _, rk in mine] == list(range(1, K + 1))


def test_true_nn_recall_at_20(spark, emb):
    """The operational guarantee (Jegou recall@R): every query's TRUE
    nearest neighbor appears in the ADC top-20, default codebooks."""
    rows = {r["vec_id"]: _quant(np.array(r["embedding"])) for r in emb.collect()}
    got = pq_adc_topk(emb, emb.filter("vec_id % 40 = 0"), DIM, k=20, m=M, ks=KS).collect()
    byq = {}
    for r in got:
        byq.setdefault(r["query_id"], set()).add(r["vec_id"])
    assert len(byq) == len([i for i in rows if i % 40 == 0])
    for qid, cand in byq.items():
        nn = min(
            (int(((rows[qid] - v) ** 2).sum()), i)
            for i, v in rows.items()
            if i != qid
        )[1]
        assert nn in cand


def _quant_error(rows, cbs):
    tot = 0
    for v in rows.values():
        for mi in range(len(cbs)):
            sl = v[mi * SUB : (mi + 1) * SUB]
            tot += min(
                int(((sl - np.array(cw)) ** 2).sum()) for cw in cbs[mi]
            )
    return tot


def test_training_reduces_quantization_error(spark, emb):
    """The Lloyd guarantee the recall metric can't see at toy scale:
    per-subspace training strictly reduces total quantization error
    (sum over rows of the min codeword distance) vs the seeded init."""
    rows = {r["vec_id"]: _quant(np.array(r["embedding"])) for r in emb.collect()}
    seeded = init_codebooks(DIM, M, KS)
    trained = train_codebooks(emb, DIM, m=M, ks=KS, iters=3)
    assert _quant_error(rows, trained) < _quant_error(rows, seeded)


def test_partition_invariance(spark, emb):
    a = pq_adc_topk(emb, emb.filter("vec_id % 40 = 0"), DIM, k=K, m=M, ks=KS)
    b = pq_adc_topk(
        emb.repartition(7), emb.filter("vec_id % 40 = 0"), DIM, k=K, m=M, ks=KS
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_sql_twin_parity(spark, emb, tmp_path):
    import duckdb

    p = str(tmp_path / "emb.parquet")
    emb.write.mode("overwrite").parquet(p)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM parquet_scan('{p}/*.parquet')"
    )
    want = sorted(
        map(
            tuple,
            con.execute(
                pq_adc_topk_sql(dim=DIM, k=K, m=M, ks=KS, query_mod=40)
            ).fetchall(),
        )
    )
    got = sorted(
        map(
            tuple,
            pq_adc_topk(
                emb, emb.filter("vec_id % 40 = 0"), DIM, k=K, m=M, ks=KS
            ).collect(),
        )
    )
    assert got == want
