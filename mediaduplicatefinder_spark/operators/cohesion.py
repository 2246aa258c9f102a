"""Cluster cohesion audit (E161): the chaining-effect QA report for
transitive dedup clustering.

Star/connected-components clustering (clustering.py, the reference's
greedy star scan main_cli.cpp:629-705) merges by REACHABILITY: a chain
of J>0.6 edges can connect members whose direct similarity is far
below the threshold (single-linkage chaining — the classic failure
mode every dedup postmortem rediscovers). Deleting "duplicates" from a
low-cohesion cluster destroys non-duplicate content; this operator
makes the risk a RELATION instead of an anecdote: per SIMILAR cluster,
the exact pairwise-Jaccard profile of its members —

- ``n_members``, ``truncated`` (audit capped at ``max_exact`` members,
  deterministic lowest-url sample so reruns and the oracle agree),
- ``n_pairs`` evaluated, ``min_jaccard`` / ``mean_jaccard``,
- ``n_below`` — pairs under the verify threshold, co-clustered ONLY by
  transitivity (0 = the cluster is a genuine clique, its keeper can
  absorb deletes safely; large = review before acting).

Float discipline (the E32/E46 cross-engine contract): every pairwise
Jaccard is rounded to 8 dp and cast to DECIMAL before aggregation, so
partial-sum order cannot drift; with ``max_exact = 64`` a cluster sums
at most 2,016 such values — under 13 significant digits, so the final
double cast is exact in both engines, and ``mean`` is one IEEE
division of exact values. ``min`` and the ``< t`` count compare the
rounded values, identical in both engines by construction.

Scale shape: one rank window per cluster (cluster-sized groups), the
pair join is keyed by ``cluster_id`` so cost is sum of per-cluster
``min(n, max_exact)^2`` — bounded by the cap, never corpus-quadratic;
token arrays join in by member id (two hash joins). Map-side-combining
final groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DEC = "decimal(12,8)"


def _audited_pairs(
    clusters,
    tokens,
    url_col: str,
    tokens_col: str,
    max_exact: int,
    symmetric: bool,
):
    """Shared audit discipline of :func:`cluster_cohesion` and
    :func:`cluster_medoids` (review r5 — previously two verbatim
    copies): SIMILAR members ranked by lowest url, capped at
    ``max_exact``, token arrays joined, within-cluster pair join with
    round-8 DECIMAL Jaccard.  ``symmetric=False`` -> canonical
    url_a < url_b pairs (cohesion); ``symmetric=True`` -> both
    orientations, url_a carried (medoid accumulation).  Returns
    (ranked, pairs)."""
    sim = clusters.filter(F.col("kind") == "SIMILAR").select(
        F.col(url_col).alias("m_url"), "cluster_id"
    )
    w = Window.partitionBy("cluster_id").orderBy("m_url")
    ranked = (
        sim.withColumn("rk", F.row_number().over(w))
        .withColumn(
            "n_members",
            F.count(F.lit(1)).over(Window.partitionBy("cluster_id")),
        )
        .filter(F.col("n_members") >= 2)
    )
    audited = ranked.filter(F.col("rk") <= max_exact).join(
        tokens.select(
            F.col(url_col).alias("m_url"), F.col(tokens_col).alias("th")
        ),
        "m_url",
    )
    a = audited.select(
        "cluster_id",
        F.col("m_url").alias("url_a"),
        F.col("th").alias("ha"),
        "n_members",
    ).alias("a")
    b = audited.select(
        "cluster_id", F.col("m_url").alias("url_b"), F.col("th").alias("hb")
    ).alias("b")
    inter = F.size(F.array_intersect(F.col("ha"), F.col("hb")))
    union = F.size("ha") + F.size("hb") - inter
    jac = F.round(
        F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0)),
        8,
    ).cast(_DEC)
    cond = (
        F.col("url_a") != F.col("url_b")
        if symmetric
        else F.col("url_a") < F.col("url_b")
    )
    sel = [F.col("a.cluster_id").alias("cluster_id"), "n_members"]
    if symmetric:
        sel.append("url_a")
    pairs = a.join(
        b, (F.col("a.cluster_id") == F.col("b.cluster_id")) & cond
    ).select(*sel, jac.alias("j"))
    return ranked, pairs



def cluster_cohesion(
    clusters: DataFrame,
    tokens: DataFrame,
    url_col: str = "url",
    tokens_col: str = "th",
    threshold: float = 0.6,
    max_exact: int = 64,
) -> DataFrame:
    """``clusters(url, cluster_id, kind)`` x ``tokens(url, th sorted
    hash array)`` -> one cohesion row per SIMILAR cluster of >= 2
    members. ``th`` must be the distinct sorted token-hash array (the
    verify-stage representation)."""
    ranked, pairs = _audited_pairs(
        clusters, tokens, url_col, tokens_col, max_exact, symmetric=False
    )
    t_dec = F.lit(float(threshold)).cast(_DEC)
    return (
        pairs.groupBy("cluster_id")
        .agg(
            F.first("n_members").alias("n_members"),
            F.count(F.lit(1)).alias("n_pairs"),
            F.min("j").cast("double").alias("min_jaccard"),
            (F.sum("j").cast("double") / F.count(F.lit(1))).alias("mean_jaccard"),
            F.sum(F.when(F.col("j") < t_dec, 1).otherwise(0)).alias("n_below"),
        )
        .withColumn("truncated", F.col("n_members") > F.lit(max_exact))
        .select(
            "cluster_id",
            F.col("n_members").cast("long").alias("n_members"),
            "truncated",
            "n_pairs",
            "min_jaccard",
            "mean_jaccard",
            F.col("n_below").cast("long").alias("n_below"),
        )
    )


def cohesion_tail_sql(threshold: float = 0.6, max_exact: int = 64) -> str:
    """Oracle tail over the dedup oracle's ``flagged`` CTE (url,
    cluster_id, kind) and the ``fold``/``th`` token relations of the
    SAME WITH-chain: naive within-cluster pairs + the identical
    round-8 DECIMAL aggregation. Append after _clusters_flagged_ctes
    (or the exact-channel base + tail)."""
    return f""",
simm AS (
  SELECT url AS m_url, cluster_id,
         row_number() OVER (PARTITION BY cluster_id ORDER BY url) AS rk,
         count(*) OVER (PARTITION BY cluster_id) AS n_members
  FROM flagged WHERE kind = 'SIMILAR'
),
tokset AS (
  SELECT url, list(DISTINCT f) AS fs FROM fold GROUP BY url
),
aud AS (
  SELECT s.m_url, s.cluster_id, s.n_members, t.fs
  FROM simm s JOIN tokset t ON t.url = s.m_url
  WHERE s.n_members >= 2 AND s.rk <= {max_exact}
),
cpairs AS (
  SELECT a.cluster_id, a.n_members,
         round(
           CASE WHEN len(a.fs) + len(b.fs) - len(list_intersect(a.fs, b.fs)) > 0
                THEN len(list_intersect(a.fs, b.fs))::DOUBLE
                     / (len(a.fs) + len(b.fs) - len(list_intersect(a.fs, b.fs)))
                ELSE 0.0 END, 8)::DECIMAL(12,8) AS j
  FROM aud a JOIN aud b
    ON a.cluster_id = b.cluster_id AND a.m_url < b.m_url
)
SELECT cluster_id,
       any_value(n_members)::BIGINT AS n_members,
       any_value(n_members) > {max_exact} AS truncated,
       count(*) AS n_pairs,
       min(j)::DOUBLE AS min_jaccard,
       sum(j)::DOUBLE / count(*) AS mean_jaccard,
       sum(CASE WHEN j < {threshold}::DECIMAL(12,8) THEN 1 ELSE 0 END)::BIGINT
         AS n_below
FROM cpairs
GROUP BY cluster_id
"""


def cluster_medoids(
    clusters: DataFrame,
    tokens: DataFrame,
    url_col: str = "url",
    tokens_col: str = "th",
    max_exact: int = 64,
) -> DataFrame:
    """Medoid election (E166): per SIMILAR cluster, the member with the
    maximum TOTAL exact Jaccard similarity to its (audited) co-members
    — the classic cluster-representative rule (k-medoids' argmax
    centrality, and the canonical-document pick in dedup postmortems),
    versus the reference's metadata keeper priority (O1, keeper.py:
    oldest/shortest-path wins). A medoid keeper maximizes what the
    retained copy shares with everything deleted under it; the two
    elections are complementary relations, not replacements.

    Same audit discipline as :func:`cluster_cohesion`: deterministic
    lowest-url cap at ``max_exact`` members (``truncated`` flags it),
    round-8 DECIMAL pair values so the <= 63-summand per-member totals
    are exact in both engines (the E32/E46 contract), argmax ties
    broken by lowest url. Cost is the same capped within-cluster pair
    join keyed by ``cluster_id`` — never corpus-quadratic.

    Output: cluster_id, n_members, truncated, medoid_url,
    medoid_total (exact-decimal sum, cast double), medoid_mean
    (total / audited co-member count, one IEEE division).
    """
    # symmetric pairs: every audited member accumulates its similarity
    # to every OTHER audited member
    ranked, pairs = _audited_pairs(
        clusters, tokens, url_col, tokens_col, max_exact, symmetric=True
    )
    totals = pairs.groupBy("cluster_id", "url_a").agg(
        F.first("n_members").alias("n_members"),
        F.sum("j").alias("tot"),
        F.count(F.lit(1)).alias("n_others"),
    )
    mw = Window.partitionBy("cluster_id").orderBy(
        F.col("tot").desc(), F.col("url_a")
    )
    return (
        totals.withColumn("mrk", F.row_number().over(mw))
        .filter(F.col("mrk") == 1)
        .select(
            "cluster_id",
            F.col("n_members").cast("long").alias("n_members"),
            (F.col("n_members") > F.lit(max_exact)).alias("truncated"),
            F.col("url_a").alias("medoid_url"),
            F.col("tot").cast("double").alias("medoid_total"),
            (F.col("tot").cast("double") / F.col("n_others")).alias(
                "medoid_mean"
            ),
        )
    )


def medoid_tail_sql(max_exact: int = 64) -> str:
    """Oracle tail for :func:`cluster_medoids` over the dedup oracle's
    ``flagged``/``fold`` CTEs — naive symmetric within-cluster pairs,
    identical round-8 DECIMAL totals, identical argmax tie rule."""
    return f""",
simm AS (
  SELECT url AS m_url, cluster_id,
         row_number() OVER (PARTITION BY cluster_id ORDER BY url) AS rk,
         count(*) OVER (PARTITION BY cluster_id) AS n_members
  FROM flagged WHERE kind = 'SIMILAR'
),
tokset AS (
  SELECT url, list(DISTINCT f) AS fs FROM fold GROUP BY url
),
aud AS (
  SELECT s.m_url, s.cluster_id, s.n_members, t.fs
  FROM simm s JOIN tokset t ON t.url = s.m_url
  WHERE s.n_members >= 2 AND s.rk <= {max_exact}
),
spairs AS (
  SELECT a.cluster_id, a.n_members, a.m_url AS url_a,
         round(
           CASE WHEN len(a.fs) + len(b.fs) - len(list_intersect(a.fs, b.fs)) > 0
                THEN len(list_intersect(a.fs, b.fs))::DOUBLE
                     / (len(a.fs) + len(b.fs) - len(list_intersect(a.fs, b.fs)))
                ELSE 0.0 END, 8)::DECIMAL(12,8) AS j
  FROM aud a JOIN aud b
    ON a.cluster_id = b.cluster_id AND a.m_url <> b.m_url
),
member_tot AS (
  SELECT cluster_id, url_a, any_value(n_members) AS n_members,
         sum(j) AS tot, count(*) AS n_others
  FROM spairs GROUP BY cluster_id, url_a
),
medoid_rk AS (
  SELECT *, row_number() OVER (
           PARTITION BY cluster_id ORDER BY tot DESC, url_a) AS mrk
  FROM member_tot
)
SELECT cluster_id, n_members::BIGINT AS n_members,
       n_members > {max_exact} AS truncated,
       url_a AS medoid_url,
       tot::DOUBLE AS medoid_total,
       tot::DOUBLE / n_others AS medoid_mean
FROM medoid_rk WHERE mrk = 1
"""


def edge_triangle_support(edges: DataFrame, min_support: int = 0) -> DataFrame:
    """Triangle support per verified similar edge (E168): the number of
    common neighbors of its endpoints in the similarity graph — the
    k-truss quantity (an edge in a k-truss sits in >= k-2 triangles;
    Cohen 2008). Support 0 identifies CHAIN BRIDGES: edges whose
    removal is the published remedy for single-linkage chaining
    (require triangle support before letting an edge merge clusters),
    the acting sibling of the :func:`cluster_cohesion` report.

    Shape: one symmetric explode + one map-side-combining groupBy to
    per-node sorted neighbor arrays, then two hash joins keyed by the
    edge endpoints and an ``array_intersect`` size — no triangle
    enumeration, no self-join on the (possibly hot) neighbor relation.
    Degrees are bounded by the candidate channel's bucket caps, so
    neighbor arrays stay small at corpus scale by construction.

    Output: url_a, url_b, score, deg_a, deg_b, support (filtered to
    ``>= min_support`` when given).
    """
    sym = edges.select(
        F.col("url_a").alias("src"), F.col("url_b").alias("dst")
    ).unionAll(
        edges.select(F.col("url_b").alias("src"), F.col("url_a").alias("dst"))
    )
    adj = sym.groupBy("src").agg(
        F.sort_array(F.collect_set("dst")).alias("nbrs")
    )
    out = (
        edges.select("url_a", "url_b", "score")
        .join(
            adj.select(F.col("src").alias("url_a"), F.col("nbrs").alias("na")),
            "url_a",
        )
        .join(
            adj.select(F.col("src").alias("url_b"), F.col("nbrs").alias("nb")),
            "url_b",
        )
        .select(
            "url_a",
            "url_b",
            "score",
            F.size("na").alias("deg_a"),
            F.size("nb").alias("deg_b"),
            F.size(F.array_intersect("na", "nb")).alias("support"),
        )
    )
    if min_support > 0:
        out = out.filter(F.col("support") >= min_support)
    return out


def triangle_support_tail_sql(min_support: int = 0) -> str:
    """Oracle tail for :func:`edge_triangle_support` over the dedup
    oracle's ``edges``/``sym`` CTEs (lsh_base + _exact_and_edges)."""
    gate = f"WHERE support >= {min_support}" if min_support > 0 else ""
    return f""",
adj AS (
  SELECT src, list_sort(list(DISTINCT dst)) AS nbrs FROM sym GROUP BY src
)
SELECT * FROM (
  SELECT e.url_a, e.url_b, e.score,
         len(a.nbrs)::INT AS deg_a, len(b.nbrs)::INT AS deg_b,
         len(list_intersect(a.nbrs, b.nbrs))::INT AS support
  FROM edges e
  JOIN adj a ON a.src = e.url_a
  JOIN adj b ON b.src = e.url_b
) {gate}
"""
