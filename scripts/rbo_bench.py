"""Rank-aware ANN evidence (E204): RBO@10 beside recall@10 for
representative channels over the same 50k deterministic corpus as
scripts/ann_bench.py.  Set recall grades WHAT a channel returns; RBO
grades the ORDER — a channel can return the right 10 items position-
blind-perfect yet rank them badly, and the two columns separate those
failure modes.  Metric values only (deterministic); timings live in
BENCH/ANN.md's main sweep.

Usage: python scripts/rbo_bench.py [n_corpus] [out_md]
(appends a section to BENCH/ANN.md)
"""

from __future__ import annotations

import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

from ann_bench import K, N_QUERIES, make_corpus  # noqa: E402

from mediaduplicatefinder_spark.operators.embeddings import (  # noqa: E402
    ann_lsh_topk,
    cosine_topk,
)
from mediaduplicatefinder_spark.operators.ivf import ivf_topk  # noqa: E402
from mediaduplicatefinder_spark.operators.rbo import rbo_topk  # noqa: E402
from mediaduplicatefinder_spark.session import get_spark  # noqa: E402

DIM = 64


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    out_md = sys.argv[2] if len(sys.argv) > 2 else "BENCH/ANN.md"
    spark = get_spark("rbo-bench")
    corpus = make_corpus(spark, n)
    corpus.count()
    queries = corpus.filter(f"vec_id < {N_QUERIES}").persist()
    queries.count()

    exact = cosine_topk(corpus, queries, k=K).persist()
    truth = {(r.query_id, r.vec_id) for r in exact.collect()}

    channels = [
        ("LSH 16x4-bit bands", ann_lsh_topk(corpus, queries, k=K, band_bits=4)),
        ("LSH 8x8-bit bands", ann_lsh_topk(corpus, queries, k=K, band_bits=8)),
        ("IVF n_cents=64 n_probe=4", ivf_topk(corpus, queries, DIM, k=K, n_probe=4, n_cents=64)),
        ("IVF n_cents=64 n_probe=16", ivf_topk(corpus, queries, DIM, k=K, n_probe=16, n_cents=64)),
    ]
    lines = [
        "",
        f"## RBO@{K} beside recall@{K} (E204; same corpus/queries as above)",
        "",
        "Set recall is position-blind; RBO (p=0.9, truncated form) is",
        "top-weighted rank agreement with the exact ranking — identical",
        "item sets in a different order score recall 1.0 but RBO < 1.0",
        f"(identical-ranking ceiling at k={K}: {1 - 0.9**K:.4f}).",
        "",
        "| channel | recall@10 | mean RBO@10 |",
        "|---|---|---|",
    ]
    for name, df in channels:
        got = {(r.query_id, r.vec_id) for r in df.collect()}
        rec = len(got & truth) / len(truth)
        rbo_rows = rbo_topk(exact, df, k=K, p=0.9).collect()
        # rbo_topk keys the universe off list_a, so a degenerate
        # channel (empty exact ranking or everything filtered out) can
        # return zero rows — report 0 instead of ZeroDivisionError.
        mean_rbo = (
            sum(r["rbo"] for r in rbo_rows) / len(rbo_rows)
            if rbo_rows
            else 0.0
        )
        lines.append(f"| {name} | {rec:.4f} | {mean_rbo:.4f} |")
        print(f"{name}: recall={rec:.4f} rbo={mean_rbo:.4f}", flush=True)
    with open(out_md, "a") as f:
        f.write("\n".join(lines) + "\n")
    print(f"appended to {out_md}")


if __name__ == "__main__":
    sys.exit(main())
