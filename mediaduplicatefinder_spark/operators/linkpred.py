"""Resource-allocation link prediction over the similarity graph
(E207): Zhou / Lü / Zhang, "Predicting missing links via local
information" (Eur. Phys. J. B 2009) — the strongest of the classic
local link-prediction indices in their benchmark, and the one with a
pure-rational form.

Why it belongs in a dedup engine: every candidate channel has a
recall boundary (band misses, caps, thresholds), and the verified
similarity graph itself encodes where those misses probably are — two
documents sharing several similar NEIGHBORS but no direct edge are
likely a missed pair (the same transitive evidence single-linkage
exploits, made LOCAL and scored instead of blindly merged).  The RA
index scores a non-edge (x, y) by Σ_{z ∈ Γ(x)∩Γ(y)} 1/deg(z): common
neighbors weighted by their exclusivity — a shared hub contributes
almost nothing, a shared degree-2 document is strong evidence.  The
output is a RE-VERIFICATION WORKLIST: feed the top-scored non-edges
back through the pairwise verifier (P6/P4), the recall-repair loop
recallaudit.py measures.

Chosen over Adamic-Adar (1/log deg) deliberately: the log crosses
libm, RA's 1/deg does not — scores are Σ floor(SCALE/deg(z)), EXACT
integers in both engines (the repo's float-parity discipline).

Shape: degrees are one map-side-combining count; each symmetric edge
joins its middle-node weight once; candidate generation is ONE
self-join of the weighted adjacency on the middle node (O(Σ deg²)
pairs over middles with deg <= ``mid_deg_cap``); one groupBy on the
pair key; existing edges leave via one anti-join.  No Python
anywhere.

The middle-degree cap exists because the operator accepts ANY edge
list, not just the dedup similarity graph whose degrees the candidate
channel's bucket caps already bound: fed the raw link graph, a single
10^6-degree hub would otherwise emit 10^12 wedge rows from one join
key.  Capped middles are also the theory's choice, not just the
engine's — a shared neighbor of degree d contributes floor(scale/d),
so a hub past the cap adds at most scale/cap per pair (< 0.1% of one
exclusive neighbor at the default cap) while costing deg² rows.  The
cap is NOT silent: :func:`ra_cap_metrics` reports how many middles an
input loses and their degree mass (pair it with any production run —
the mirrors.py host_cap pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RA_SCALE = 1_000_000
RA_MID_DEG_CAP = 1024


def ra_link_pairs(
    edges: DataFrame,
    min_common: int = 2,
    scale: int = RA_SCALE,
    mid_deg_cap: int = RA_MID_DEG_CAP,
) -> DataFrame:
    """edges(url_a, url_b) canonical -> (url_a, url_b, n_common,
    ra_scaled) for NON-edges with >= min_common shared neighbors;
    ra_scaled = Σ floor(scale / deg(z)) over shared z with
    deg(z) <= mid_deg_cap (see module docstring; ra_cap_metrics
    reports what a given input loses to the cap)."""
    sym = edges.select(
        F.col("url_a").alias("src"), F.col("url_b").alias("dst")
    ).unionAll(
        edges.select(F.col("url_b").alias("src"), F.col("url_a").alias("dst"))
    )
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # (middle z, neighbor x, w = floor(scale/deg(z))); hub middles
    # leave BEFORE the self-join so no join key explodes.
    symw = (
        sym.join(deg, "src")
        .filter(F.col("deg") <= mid_deg_cap)
        .select("src", "dst", F.expr(f"{scale} div deg").alias("w"))
    )
    a = symw.select(
        F.col("src").alias("mid"), F.col("dst").alias("url_a"), "w"
    )
    b = symw.select(F.col("src").alias("mid"), F.col("dst").alias("url_b"))
    cand = (
        a.join(b, "mid")
        .filter(F.col("url_a") < F.col("url_b"))
        .groupBy("url_a", "url_b")
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.sum("w").alias("ra_scaled"),
        )
    )
    return (
        cand.join(edges.select("url_a", "url_b"), ["url_a", "url_b"], "left_anti")
        .filter(F.col("n_common") >= min_common)
    )


def ra_cap_metrics(
    edges: DataFrame, mid_deg_cap: int = RA_MID_DEG_CAP
) -> DataFrame:
    """One-row no-silent-caps companion to :func:`ra_link_pairs`:
    (n_mid_total, n_mid_capped, max_deg, capped_deg_sum) — how many
    middle nodes the cap drops from the wedge join and the wedge mass
    (Σ deg over capped middles) that drop avoids.  O(E) map-side
    count, no join."""
    sym = edges.select(
        F.col("url_a").alias("src"), F.col("url_b").alias("dst")
    ).unionAll(
        edges.select(F.col("url_b").alias("src"), F.col("url_a").alias("dst"))
    )
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    over = F.col("deg") > mid_deg_cap
    return deg.agg(
        F.count(F.lit(1)).alias("n_mid_total"),
        F.sum(over.cast("long")).alias("n_mid_capped"),
        F.max("deg").alias("max_deg"),
        F.sum(F.when(over, F.col("deg")).otherwise(F.lit(0))).alias(
            "capped_deg_sum"
        ),
    )


def neighborhood_jaccard_pairs(
    edges: DataFrame,
    min_common: int = 2,
    thr_num: int = 1,
    thr_den: int = 2,
) -> DataFrame:
    """Directed distinct edges(src, dst) -> (host_a, host_b, n_common,
    jaccard): out-neighborhood Jaccard over host pairs sharing >= 1
    out-target — the STRUCTURAL mirror signal (mirrors serve the same
    content, so they link the same places; mirrors.py is the content
    sibling).  The threshold predicate is integer cross-multiplied
    (c·thr_den >= thr_num·(da+db-c)); the reported jaccard is one
    division of exact integers.  Same middle-join shape as
    :func:`ra_link_pairs` — O(Σ indeg²) candidate pairs."""
    odeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    a = edges.select(F.col("dst").alias("mid"), F.col("src").alias("host_a"))
    b = edges.select(F.col("dst").alias("mid"), F.col("src").alias("host_b"))
    cand = (
        a.join(b, "mid")
        .filter(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    joined = cand.join(
        odeg.select(F.col("src").alias("host_a"), F.col("deg").alias("deg_a")),
        "host_a",
    ).join(
        odeg.select(F.col("src").alias("host_b"), F.col("deg").alias("deg_b")),
        "host_b",
    )
    union = F.col("deg_a") + F.col("deg_b") - F.col("n_common")
    return (
        joined.filter(
            (F.col("n_common") >= min_common)
            & (F.col("n_common") * thr_den >= F.lit(thr_num) * union)
        )
        .select(
            "host_a",
            "host_b",
            "n_common",
            (F.col("n_common").cast("double") / union).alias("jaccard"),
        )
    )


def neighborhood_jaccard_sql(
    edges_sql: str,
    min_common: int = 2,
    thr_num: int = 1,
    thr_den: int = 2,
) -> str:
    """DuckDB twin over ``edges_sql`` -> distinct (src, dst)."""
    return f"""
WITH nj_edges AS ({edges_sql}),
nj_deg AS (SELECT src, count(*) AS deg FROM nj_edges GROUP BY src),
nj_cand AS (
  SELECT a.src AS host_a, b.src AS host_b, count(*) AS n_common
  FROM nj_edges a JOIN nj_edges b
    ON a.dst = b.dst AND a.src < b.src
  GROUP BY 1, 2
)
SELECT c.host_a, c.host_b, c.n_common::BIGINT AS n_common,
       c.n_common::DOUBLE / (da.deg + db.deg - c.n_common) AS jaccard
FROM nj_cand c
JOIN nj_deg da ON da.src = c.host_a
JOIN nj_deg db ON db.src = c.host_b
WHERE c.n_common >= {min_common}
  AND c.n_common * {thr_den} >= {thr_num} * (da.deg + db.deg - c.n_common)
"""


def ra_tail_sql(
    min_common: int = 2,
    scale: int = RA_SCALE,
    mid_deg_cap: int = RA_MID_DEG_CAP,
) -> str:
    """Oracle tail over the dedup twin's ``edges``/``sym`` CTEs
    (lsh_base_cte + _exact_and_edges_ctes): identical degree weights,
    middle-degree cap, middle-node self-join, anti-join, integer
    sums."""
    return f""",
ra_deg AS (SELECT src, count(*) AS deg FROM sym GROUP BY src),
ra_w AS (
  SELECT s.src AS mid, s.dst, {scale} // d.deg AS w
  FROM sym s JOIN ra_deg d ON d.src = s.src AND d.deg <= {mid_deg_cap}
),
ra_p AS (
  SELECT a.dst AS url_a, b.dst AS url_b,
         count(*) AS n_common, sum(a.w) AS ra_scaled
  FROM ra_w a JOIN ra_w b ON a.mid = b.mid AND a.dst < b.dst
  GROUP BY 1, 2
)
SELECT p.url_a, p.url_b, p.n_common::BIGINT AS n_common,
       p.ra_scaled::BIGINT AS ra_scaled
FROM ra_p p
LEFT JOIN edges e ON e.url_a = p.url_a AND e.url_b = p.url_b
WHERE e.url_a IS NULL AND p.n_common >= {min_common}
"""
