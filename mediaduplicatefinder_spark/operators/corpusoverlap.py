"""Corpus-pair overlap estimation from bottom-k sketches (E175):
Broder's resemblance estimator over KMV sketches (Broder SEQUENCES'97;
Bar-Yossef et al. RANDOM'02; Beyer et al. SIGMOD'07 for the mergeable
bottom-k form).

The dataset-level dedup decision: before mixing two corpora (two
crawls, two vendors' datasets, two snapshots) you need their token
OVERLAP — J(A,B) and the containments — but at 100 TB you cannot
intersect the raw token sets; each side keeps a tiny bottom-k sketch
of its distinct token hashes, and the estimator

    Ĵ = |S_k(A ∪ B) ∩ S_k(A) ∩ S_k(B)| / k

(S_k = the k smallest hash values; S_k(A ∪ B) is computable from the
two sketches alone — the k smallest of their union) is unbiased with
se ~ 1/sqrt(k).  Everything is an exact order statistic over a shared
hash function, so the estimate is DETERMINISTIC: the DuckDB twin
re-derives the identical sketches and the identical estimate, and the
driver gate value-checks estimate AND exact truth side by side.

Spark shape (the E75 KMV prune pattern, partition-invariant):

- one distinct (group, fnv64(token)) relation — the same FNV-1a-64
  token hashes the signature/oracle stack already shares;
- per-(group, input-partition) local bottom-k prune via row_number —
  the global k-th smallest always survives a local bottom-k, so the
  per-group sort sees only k·partitions rows;
- per-group sketch = sorted array of the k smallest (stored in
  XOR-min64-shifted space so signed int64 array order == unsigned
  hash order);
- group-pair grid is a crossJoin of G one-row-per-group aggregates
  (G = #groups, tiny by construction — the declared tiny-aggregate
  crossJoin precedent);
- the estimator is pure JVM array algebra: array_union → array_sort →
  slice k → array_intersect;
- the EXACT columns (the oracle half of the output) come from the
  distinct-hash self-join — affordable at driver scale, and exactly
  the thing the sketch replaces at 100 TB (documented: production
  reads the estimate columns only).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mediaduplicatefinder_spark.config import DEFAULT_CONFIG, EngineConfig
from mediaduplicatefinder_spark.functions import hashing
from mediaduplicatefinder_spark.functions.sigcore import token_seq

_MIN64 = -(1 << 63)


def _group_token_hashes(
    docs: DataFrame, group_col: str, cfg: EngineConfig
) -> DataFrame:
    """Distinct (grp, h): FNV-1a-64 over the engine's token semantics
    (token_seq — identical normalization to th in the SQL twin)."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            grps: list = []
            hs: list = []
            for g, t in zip(pdf[group_col], pdf["text"]):
                toks = sorted(set(token_seq(t or "", cfg.min_token_len)))
                if not toks:
                    continue
                vals = hashing.to_int64(hashing.fnv1a64(toks))
                grps.extend([g] * len(vals))
                hs.extend(int(x) for x in vals)
            yield pd.DataFrame({"grp": grps, "h": hs})

    return (
        docs.select(F.col(group_col), "text")
        .mapInPandas(fn, "grp string, h long")
        .distinct()
    )


def corpus_overlap(
    docs: DataFrame,
    group_col: str = "lang",
    k: int = 256,
    cfg: EngineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """(grp_a, grp_b, n_a, n_b, est_jaccard, exact_jaccard,
    exact_containment_a): per group pair, the bottom-k estimate next
    to the exact truth."""
    dh = _group_token_hashes(docs, group_col, cfg).persist()

    # shifted space: int64 order == unsigned hash order
    hs = F.col("h").bitwiseXOR(F.lit(_MIN64))
    local = Window.partitionBy("grp", "pid").orderBy(hs.asc())
    pruned = (
        dh.withColumn("pid", F.spark_partition_id())
        .withColumn("rn1", F.row_number().over(local))
        .filter(F.col("rn1") <= k)
        .drop("pid", "rn1")
    )
    per_grp = Window.partitionBy("grp").orderBy(hs.asc())
    sketches = (
        pruned.withColumn("rn", F.row_number().over(per_grp))
        .filter(F.col("rn") <= k)
        .groupBy("grp")
        .agg(F.sort_array(F.collect_list(hs)).alias("sk"))
    )
    counts = dh.groupBy("grp").agg(F.count(F.lit(1)).alias("n"))
    side = sketches.join(counts, "grp")

    pairs = (
        side.select(
            F.col("grp").alias("grp_a"),
            F.col("sk").alias("sk_a"),
            F.col("n").alias("n_a"),
        )
        .crossJoin(
            side.select(
                F.col("grp").alias("grp_b"),
                F.col("sk").alias("sk_b"),
                F.col("n").alias("n_b"),
            )
        )
        .filter(F.col("grp_a") < F.col("grp_b"))
    )

    union_k = F.slice(F.array_sort(F.array_union("sk_a", "sk_b")), 1, k)
    both = F.array_intersect("sk_a", "sk_b")
    kk = F.least(F.lit(k), F.size(F.array_union("sk_a", "sk_b")))
    est = F.size(F.array_intersect(union_k, both)).cast("double") / kk

    # exact truth from the distinct-hash relation (the sketch's oracle)
    inter = (
        dh.select(F.col("grp").alias("grp_a"), "h")
        .join(dh.select(F.col("grp").alias("grp_b"), "h"), "h")
        .filter(F.col("grp_a") < F.col("grp_b"))
        .groupBy("grp_a", "grp_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )

    out = (
        pairs.join(inter, ["grp_a", "grp_b"], "left")
        .withColumn("n_inter", F.coalesce("n_inter", F.lit(0)))
        .select(
            "grp_a",
            "grp_b",
            "n_a",
            "n_b",
            est.alias("est_jaccard"),
            (
                F.col("n_inter").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
            ).alias("exact_jaccard"),
            (F.col("n_inter").cast("double") / F.col("n_a")).alias(
                "exact_containment_a"
            ),
        )
    )
    return out


def corpus_overlap_sql(
    docs_sql: str, group_col: str = "lang", k: int = 256
) -> str:
    """DuckDB twin: identical sketches (unsigned-order bottom-k of the
    same th FNV hashes, shifted into the engine's int64 space), the
    identical union-slice estimator, and the exact columns."""
    from mediaduplicatefinder_spark.oracle.lsh_sql import lsh_base_cte

    return (
        lsh_base_cte(docs_sql=docs_sql)
        + f""", co_dh AS (
  SELECT DISTINCT d.{group_col} AS grp, t.h
  FROM th t JOIN doc_stats d USING (url)
),
co_sk AS (  -- bottom-k in unsigned order, stored XOR-min64 shifted
  -- (engine stores h XOR min64; for unsigned u that is u - 2^63)
  SELECT grp,
         list((h::HUGEINT - {1 << 63})::BIGINT ORDER BY h) AS sk
  FROM (
    SELECT grp, h,
           row_number() OVER (PARTITION BY grp ORDER BY h) AS rn
    FROM co_dh
  ) WHERE rn <= {k}
  GROUP BY grp
),
co_n AS (SELECT grp, count(*) AS n FROM co_dh GROUP BY grp),
co_pairs AS (
  SELECT a.grp AS grp_a, b.grp AS grp_b,
         a.sk AS sk_a, b.sk AS sk_b, na.n AS n_a, nb.n AS n_b
  FROM co_sk a JOIN co_sk b ON a.grp < b.grp
  JOIN co_n na ON na.grp = a.grp
  JOIN co_n nb ON nb.grp = b.grp
),
co_est AS (
  SELECT grp_a, grp_b, n_a, n_b,
         len(list_intersect(
               list_sort(list_distinct(list_concat(sk_a, sk_b)))[1:{k}],
               list_intersect(sk_a, sk_b)))::DOUBLE
           / least({k}, len(list_distinct(list_concat(sk_a, sk_b))))
           AS est_jaccard
  FROM co_pairs
),
co_inter AS (
  SELECT a.grp AS grp_a, b.grp AS grp_b, count(*) AS n_inter
  FROM co_dh a JOIN co_dh b ON a.h = b.h AND a.grp < b.grp
  GROUP BY 1, 2
)
SELECT e.grp_a, e.grp_b, e.n_a, e.n_b, e.est_jaccard,
       coalesce(i.n_inter, 0)::DOUBLE
         / (e.n_a + e.n_b - coalesce(i.n_inter, 0)) AS exact_jaccard,
       coalesce(i.n_inter, 0)::DOUBLE / e.n_a AS exact_containment_a
FROM co_est e
LEFT JOIN co_inter i ON i.grp_a = e.grp_a AND i.grp_b = e.grp_b
"""
    )
