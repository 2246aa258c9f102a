"""Cross-host mirror detection (E112).

Mirrors are the web's largest duplication source that URL-level dedup
cannot see: a whole host republishes another host's corpus under its
own urls.  E65's per-host rollup counts how MUCH of a host is
duplicated; this operator answers WHO mirrors WHOM — the host-pair
relation a crawl pipeline uses to drop entire hosts from the frontier
(far cheaper than deduplicating their pages one by one).

Shape — the inverted-index pair join on exact content keys (the A1
sha channel), never host-pairs-all-pairs: distinct (host, sha)
postings self-join on sha, so only hosts that actually share a
byte-identical document ever meet.  Universal boilerplate (empty
pages, parked-domain notices) is the skew channel: any sha present on
more than ``host_cap`` hosts is dropped as stop-content BEFORE
pairing (the E80 stop-shingle rule at document granularity) — shared
counts are then defined within the capped sha space, mirrored in the
twin.  Mirror flag: shared docs cover at least half of the SMALLER
host (integer cross-multiply).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MIRROR_HOST_CAP = 16


def mirror_host_pairs(
    pages: DataFrame,
    host_cap: int = MIRROR_HOST_CAP,
    text_col: str = "text",
) -> DataFrame:
    """pages(host, doc_id, text) -> (host_a, host_b, shared, n_a,
    n_b, is_mirror) for host pairs sharing >= 1 kept sha."""
    post = (
        pages.select(
            "host", F.sha2(F.col(text_col), 256).alias("sha")
        )
        .distinct()
        .localCheckpoint(eager=True)  # feeds cap count, host sizes, AND
        # the pair join — checkpointed (not persisted) so repeated calls
        # don't pin storage (review r5)
    )
    cap = post.groupBy("sha").agg(F.count(F.lit(1)).alias("nh"))
    keep = post.join(cap.filter(F.col("nh") <= host_cap), "sha").select(
        "host", "sha"
    )
    sizes = keep.groupBy("host").agg(F.count(F.lit(1)).alias("n"))
    a = keep.select(F.col("host").alias("host_a"), "sha")
    b = keep.select(F.col("host").alias("host_b"), "sha")
    pairs = (
        a.join(b, "sha")
        .filter(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    na = sizes.select(F.col("host").alias("host_a"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col("host").alias("host_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(na, "host_a")
        .join(nb, "host_b")
        .select(
            "host_a",
            "host_b",
            "shared",
            "n_a",
            "n_b",
            (
                F.col("shared") * 2 >= F.least(F.col("n_a"), F.col("n_b"))
            ).alias("is_mirror"),
        )
    )


def mirror_host_pairs_sql(
    pages_sql: str, host_cap: int = MIRROR_HOST_CAP
) -> str:
    """DuckDB twin; ``pages_sql`` SELECTs (host, doc_id, text)."""
    return f"""
WITH mpg AS ({pages_sql}),
post AS (SELECT DISTINCT host, sha256(text) AS sha FROM mpg),
cap AS (SELECT sha, count(*)::BIGINT AS nh FROM post GROUP BY sha),
keep AS (
  SELECT post.host, post.sha FROM post
  JOIN cap USING (sha) WHERE cap.nh <= {host_cap}
),
sizes AS (SELECT host, count(*)::BIGINT AS n FROM keep GROUP BY host),
pairs AS (
  SELECT a.host AS host_a, b.host AS host_b, count(*)::BIGINT AS shared
  FROM keep a JOIN keep b ON a.sha = b.sha AND a.host < b.host
  GROUP BY a.host, b.host
)
SELECT host_a, host_b, shared, sa.n AS n_a, sb.n AS n_b,
       shared * 2 >= least(sa.n, sb.n) AS is_mirror
FROM pairs
JOIN sizes sa ON sa.host = host_a
JOIN sizes sb ON sb.host = host_b
"""
