"""Stage-by-stage wall-time profile of the dedup pipeline on the bench
pages corpus. Usage: python scripts/profile_pipeline.py [n_docs] [cpus]"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from mediaduplicatefinder_spark.config import DEFAULT_CONFIG as CFG
from mediaduplicatefinder_spark.operators import exact as exact_ops
from mediaduplicatefinder_spark.operators.candidates import candidate_pairs
from mediaduplicatefinder_spark.operators.clustering import connected_components
from mediaduplicatefinder_spark.operators.signatures import page_signatures
from mediaduplicatefinder_spark.operators.verify import similar_edges, verify_pairs
from mediaduplicatefinder_spark.session import get_spark

N = int(sys.argv[1]) if len(sys.argv) > 1 else 5000
CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 32

import bench

bench.PAGES_N = N
pages_dir = bench.bench_pages_path()

spark = get_spark("profile", parallelism=CPUS, shuffle_partitions=max(CPUS, 16))
t_all = time.time()

def mark(label, t0, n=None):
    print(f"{label:<28} {time.time()-t0:7.2f}s" + (f"  rows={n}" if n is not None else ""), flush=True)

t0 = time.time()
pages = spark.read.parquet(f"{pages_dir}/pages.parquet")
# sig-first: one fused narrow pass (extract + sha + signatures), then
# the sha256 window over signature rows
sigs_all = page_signatures(pages, CFG, min_partitions=CPUS)
grouped = exact_ops.exact_groups(sigs_all).persist()
n = grouped.count()
mark("fused sigs+sha window", t0, n)

t0 = time.time()
sigs = exact_ops.similarity_survivors(grouped).drop("sha256")
n = sigs.count()
mark("survivor filter", t0, n)

t0 = time.time()
cands, bm, _bk = candidate_pairs(sigs, CFG)
n = cands.count()
mark("candidates", t0, n)
print("  bucket metrics:", bm.collect()[0].asDict())

t0 = time.time()
verified = verify_pairs(cands, sigs, CFG).persist()
n = verified.count()
mark("verify", t0, n)

t0 = time.time()
edges = similar_edges(verified)
labels = connected_components(edges, CFG)
n = labels.count()
mark("connected components", t0, n)

print(f"TOTAL {time.time()-t_all:.2f}s  ({N/(time.time()-t_all):.0f} docs/s)")
spark.stop()
