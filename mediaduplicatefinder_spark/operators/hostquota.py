"""Per-host quota sampling (E83).

Web corpora are host-skewed: a handful of domains (forums, wikis,
link farms) contribute millions of near-identical pages.  Published
crawl pipelines cap documents per registered domain BEFORE expensive
stages, picking survivors deterministically so re-runs and incremental
crawls keep the same sample (FineWeb per-domain caps; the E29
hash-gate rationale).  Selection key = ``xxhash64(url)`` — a stable
per-document lottery with no RNG state — tie-broken by url.

Scale shape: the naive formulation is one window over every row keyed
by host (the mega-host IS the skew).  Like the E75 KMV prune, rows
are first cut to the quota within (host, input partition) — correct
for ANY partition assignment, since a global top-Q member is a local
top-Q member — so the global per-host sort only sees
``quota * n_partitions`` rows per host.

Output is per-document (host, url, pick_rank, kept): the decision
table a downstream anti-join consumes; callers wanting stats roll up
``kept``.  Oracle: urls through the pinned 16-byte XXH64 port, ranked
by the SIGNED reinterpretation (Spark orders the int64 hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mediaduplicatefinder_spark.oracle.lsh_sql import xxh64_doc_key_cte

HOST_QUOTA = 20


def host_quota_sample(
    docs: DataFrame,
    quota: int = HOST_QUOTA,
    host_col: str = "host",
    url_col: str = "url",
) -> DataFrame:
    """docs(host, url) -> (host, url, pick_rank, kept).

    urls must be exactly 16 bytes (the pinned-XXH64 oracle contract of
    every engine hash channel)."""
    h = F.xxhash64(F.col(url_col))
    # d feeds both the kept path and the cut anti-join: persist so the
    # input scans once (and pid stays frozen for the local prune)
    d = docs.select(
        F.col(host_col).alias("host"),
        F.col(url_col).alias("url"),
        h.alias("hk"),
        F.spark_partition_id().alias("pid"),
    ).persist()
    local = Window.partitionBy("host", "pid").orderBy(
        F.col("hk").asc(), F.col("url").asc()
    )
    pruned = d.withColumn("rn1", F.row_number().over(local)).filter(
        F.col("rn1") <= quota
    )
    # survivors of the local cut carry their global rank; documents cut
    # locally are by construction beyond the quota -> kept = false with
    # rank NULL (rank of a cut row is unknowable without the full sort,
    # and no consumer reads it)
    full = Window.partitionBy("host").orderBy(
        F.col("hk").asc(), F.col("url").asc()
    )
    ranked = pruned.withColumn("pick_rank", F.row_number().over(full))
    # ranks within the quota are the TRUE global ranks (the local cut
    # never removes a global top-Q member); survivors beyond the quota
    # get NULL like every locally-cut row — their pruned-set rank is
    # not the global one, and no consumer reads it
    kept = ranked.select(
        "host",
        "url",
        F.when(F.col("pick_rank") <= quota, F.col("pick_rank"))
        .cast("long")
        .alias("pick_rank"),
        (F.col("pick_rank") <= quota).alias("kept"),
    )
    cut = (
        d.join(
            ranked.select("host", "url", F.lit(1).alias("_s")),
            ["host", "url"],
            "left_anti",
        )
        .select(
            "host",
            "url",
            F.lit(None).cast("long").alias("pick_rank"),
            F.lit(False).alias("kept"),
        )
    )
    return kept.union(cut)


def host_quota_sample_sql(
    docs_sql: str, quota: int = HOST_QUOTA
) -> str:
    """DuckDB twin. ``docs_sql`` must SELECT (host, url) with 16-byte
    urls.  Ranks beyond the quota are NULL (the engine's local prune
    never materializes them)."""
    keys = xxh64_doc_key_cte("SELECT DISTINCT url FROM hq_in")
    return f"""
WITH hq_in AS ({docs_sql}),
keys AS MATERIALIZED ({keys}),
ranked AS (
  SELECT i.host, i.url,
         row_number() OVER (
           PARTITION BY i.host
           ORDER BY (CASE WHEN k.dk >= {1 << 63}
                          THEN k.dk::HUGEINT - {1 << 64}
                          ELSE k.dk::HUGEINT END) ASC, i.url ASC
         )::BIGINT AS rn
  FROM hq_in i JOIN keys k ON i.url = k.url
)
SELECT host, url,
       CASE WHEN rn <= {quota} THEN rn ELSE NULL END AS pick_rank,
       rn <= {quota} AS kept
FROM ranked
"""
