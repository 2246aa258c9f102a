"""Quick manual smoke: tiny corpus through the full pipeline."""

import time

from mediaduplicatefinder_spark.datagen.pages import generate_pages
from mediaduplicatefinder_spark.oracle.dedup import Page, run_oracle, all_similar_pairs
from mediaduplicatefinder_spark.pipeline import run_dedup
from mediaduplicatefinder_spark.session import get_spark

t0 = time.time()
pages, truth = generate_pages(n_docs=200, seed=42, min_words=30, max_words=120)
print(f"datagen {time.time()-t0:.1f}s rows={len(pages)}")
print(truth["class_kind"].value_counts().to_string())

spark = get_spark("smoke", parallelism=8, shuffle_partitions=8)
pdf = spark.createDataFrame(pages)
t0 = time.time()
res = run_dedup(spark, pdf, scan_root="")
exact = res.exact_clusters.collect()
pairs = res.pairs.filter("similar").collect()
clusters = res.clusters.collect()
metrics = res.metrics.collect()
print(f"pipeline {time.time()-t0:.1f}s")
print("exact members:", len(exact), "similar pairs:", len(pairs), "cluster rows:", len(clusters))
print("metrics:", metrics[0].asDict())

# oracle comparison
plist = [Page(r.url, r.text, r.lang, bytes(r.html)) for r in pdf.orderBy("url").collect()]
t0 = time.time()
oracle = run_oracle(plist)
opairs = all_similar_pairs(plist, {u for g in oracle.exact_groups for u in g[1:]})
print(f"oracle {time.time()-t0:.1f}s exact_groups={len(oracle.exact_groups)} "
      f"star_pairs={len(oracle.pairs)} all_pairs={len(opairs)}")

engine_pairs = {(r.url_a, r.url_b) for r in pairs}
star_recall = len(engine_pairs & oracle.pairs) / max(len(oracle.pairs), 1)
full_recall = len(engine_pairs & set(opairs)) / max(len(opairs), 1)
extra = engine_pairs - set(opairs)
print(f"recall vs star pairs: {star_recall:.4f}  vs full pair relation: {full_recall:.4f}  "
      f"extra(non-oracle) pairs: {len(extra)}")
exact_engine = {}
for r in exact:
    exact_engine.setdefault(r.cluster_id, set()).add(r.url)
exact_oracle = {min(g): set(g) for g in oracle.exact_groups}
print("exact groups match:", exact_engine == exact_oracle)
spark.stop()
