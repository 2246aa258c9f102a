"""SCAN structural graph clustering over the similarity graph (E176):
Xu / Yuruk / Feng / Schweiger, "SCAN: a Structural Clustering
Algorithm for Networks" (KDD 2007).

Why it belongs in a dedup engine: connected components (the C2
replacement) is single-linkage — one chain of borderline edges merges
everything it touches.  The engine already MEASURES that failure mode
(E161 cohesion audit) and GATES it (E168 triangle support); SCAN is
the published algorithm that CLUSTERS around it: nodes whose
ε-neighborhood is dense become CORES, clusters grow only through
cores, low-evidence nodes become BORDERS of one cluster, and nodes
bridging several clusters are classified HUBS (the chain culprits)
instead of merging them — with OUTLIERS falling out for free.

Semantics (closed neighborhoods N[u] = N(u) ∪ {u}):

- σ(u,v) = |N[u] ∩ N[v]| / sqrt(|N[u]|·|N[v]|) per similar edge;
  the ε decision is evaluated in EXACT INTEGER form,
  eps_den²·cn² >= eps_num²·da·db (ε = eps_num/eps_den), so no float
  crosses an engine boundary.
- core ⟺ |N_ε(u)| >= μ (u itself counts: σ(u,u) = 1).
- clusters = connected components over CORE–CORE ε-edges; an isolated
  core forms its own cluster.  (Growth through cores only — a shared
  border must NOT merge two clusters, which is exactly where plain CC
  differs.)
- border = non-core with an ε-edge to >= 1 core; attaches to the
  MINIMUM cluster_id among its ε-adjacent cores (the paper attaches
  to whichever cluster reaches it first — visit-order-dependent; the
  min rule is the deterministic replacement, documented).
- remaining nodes: HUB if their similarity-graph neighbors span >= 2
  distinct clusters, else OUTLIER.

Shape: everything rides the E168 neighbor-array machinery (one
symmetric explode + sorted-array groupBy + two endpoint joins — no
triangle enumeration; degrees bounded by the candidate channel's
bucket caps), then one CC run over the core-core subgraph (strictly
smaller than the full graph) and two role joins.  No Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mediaduplicatefinder_spark.config import DEFAULT_CONFIG, EngineConfig
from mediaduplicatefinder_spark.operators.clustering import (
    connected_components,
)
from mediaduplicatefinder_spark.operators.cohesion import (
    edge_triangle_support,
)


def scan_clusters(
    edges: DataFrame,
    eps_num: int = 7,
    eps_den: int = 10,
    mu: int = 3,
    cfg: EngineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """edges(url_a, url_b, score) -> (url, role, cluster_id):
    role ∈ {core, border, hub, outlier}; cluster_id NULL for
    hub/outlier."""
    ts = edge_triangle_support(edges)
    cn = F.col("support") + 2  # closed-neighborhood common count
    da = F.col("deg_a") + 1
    db = F.col("deg_b") + 1
    eps_edges = ts.filter(
        F.lit(eps_den * eps_den) * cn * cn >= F.lit(eps_num * eps_num) * da * db
    ).select("url_a", "url_b").localCheckpoint(eager=True)  # review r5: bounded, not session-pinned

    # |N_eps(u)| = 1 (self) + incident eps-edges
    neps = (
        eps_edges.select(F.col("url_a").alias("url"))
        .unionAll(eps_edges.select(F.col("url_b").alias("url")))
        .groupBy("url")
        .agg((F.count(F.lit(1)) + 1).alias("neps"))
    )
    cores = neps.filter(F.col("neps") >= mu).select("url").localCheckpoint(eager=True)

    # clusters: CC over CORE-CORE eps-edges; isolated cores self-label
    cc_edges = eps_edges.join(
        cores.select(F.col("url").alias("url_a")), "url_a"
    ).join(cores.select(F.col("url").alias("url_b")), "url_b")
    core_labels = connected_components(cc_edges, cfg)
    core_labels = (
        cores.join(core_labels, "url", "left")
        .select(
            "url", F.coalesce("cluster_id", F.col("url")).alias("cluster_id")
        )
        .localCheckpoint(eager=True)  # review r5: bounded, not session-pinned
    )

    # borders: non-core with an eps-edge to a core -> min core cluster
    eps_sym = eps_edges.select(
        F.col("url_a").alias("url"), F.col("url_b").alias("nbr")
    ).unionAll(
        eps_edges.select(F.col("url_b").alias("url"), F.col("url_a").alias("nbr"))
    )
    border_labels = (
        eps_sym.join(
            core_labels.select(
                F.col("url").alias("nbr"), F.col("cluster_id")
            ),
            "nbr",
        )
        .join(cores, "url", "left_anti")
        .groupBy("url")
        .agg(F.min("cluster_id").alias("cluster_id"))
    )

    members = core_labels.select(
        "url", F.lit("core").alias("role"), "cluster_id"
    ).unionByName(
        border_labels.select("url", F.lit("border").alias("role"), "cluster_id")
    )

    # hubs/outliers: unlabeled graph nodes, by distinct adjacent clusters
    sym = edges.select(
        F.col("url_a").alias("url"), F.col("url_b").alias("nbr")
    ).unionAll(
        edges.select(F.col("url_b").alias("url"), F.col("url_a").alias("nbr"))
    )
    unlabeled = sym.select("url").distinct().join(
        members.select("url"), "url", "left_anti"
    )
    adj_clusters = (
        sym.join(unlabeled, "url")
        .join(
            members.select(F.col("url").alias("nbr"), "cluster_id"), "nbr"
        )
        .groupBy("url")
        .agg(F.countDistinct("cluster_id").alias("nclu"))
    )
    rest = unlabeled.join(adj_clusters, "url", "left").select(
        "url",
        F.when(F.coalesce("nclu", F.lit(0)) >= 2, F.lit("hub"))
        .otherwise(F.lit("outlier"))
        .alias("role"),
        F.lit(None).cast("string").alias("cluster_id"),
    )
    return members.unionByName(rest)


def scan_tail_sql(eps_num: int = 7, eps_den: int = 10, mu: int = 3) -> str:
    """Oracle tail over the dedup twin's ``edges``/``sym`` CTEs
    (lsh_base_cte(recursive=True) + _exact_and_edges_ctes): identical
    integer ε decision, core rule, core-core recursive closure with
    isolated-core self-label, min-cluster border attachment, and
    hub/outlier classification."""
    return f""",
adj AS (
  SELECT src, list_sort(list(DISTINCT dst)) AS nbrs FROM sym GROUP BY src
),
sc_sig AS MATERIALIZED (
  SELECT e.url_a, e.url_b,
         len(list_intersect(a.nbrs, b.nbrs)) + 2 AS cn,
         len(a.nbrs) + 1 AS da, len(b.nbrs) + 1 AS db
  FROM edges e
  JOIN adj a ON a.src = e.url_a
  JOIN adj b ON b.src = e.url_b
),
sc_eps AS MATERIALIZED (
  SELECT url_a, url_b FROM sc_sig
  WHERE {eps_den * eps_den} * cn * cn >= {eps_num * eps_num} * da * db
),
sc_neps AS (
  SELECT url, count(*) + 1 AS neps FROM (
    SELECT url_a AS url FROM sc_eps
    UNION ALL SELECT url_b FROM sc_eps
  ) GROUP BY url
),
sc_core AS MATERIALIZED (SELECT url FROM sc_neps WHERE neps >= {mu}),
sc_cc AS (
  SELECT e.url_a, e.url_b FROM sc_eps e
  JOIN sc_core ca ON ca.url = e.url_a
  JOIN sc_core cb ON cb.url = e.url_b
),
sc_rsym AS (
  SELECT url_a AS src, url_b AS dst FROM sc_cc
  UNION SELECT url_b, url_a FROM sc_cc
),
sc_walk AS (
  SELECT src AS url, dst AS reach FROM sc_rsym
  UNION
  SELECT w.url, s.dst FROM sc_walk w JOIN sc_rsym s ON s.src = w.reach
),
sc_core_lab AS MATERIALIZED (
  SELECT c.url,
         coalesce(w.cid, c.url) AS cluster_id
  FROM sc_core c
  LEFT JOIN (
    SELECT url, least(url, min(reach)) AS cid FROM sc_walk GROUP BY url
  ) w ON w.url = c.url
),
sc_eps_sym AS (
  SELECT url_a AS url, url_b AS nbr FROM sc_eps
  UNION ALL SELECT url_b, url_a FROM sc_eps
),
sc_border AS (
  SELECT s.url, min(cl.cluster_id) AS cluster_id
  FROM sc_eps_sym s
  JOIN sc_core_lab cl ON cl.url = s.nbr
  WHERE s.url NOT IN (SELECT url FROM sc_core)
  GROUP BY s.url
),
sc_members AS MATERIALIZED (
  SELECT url, 'core' AS role, cluster_id FROM sc_core_lab
  UNION ALL
  SELECT url, 'border', cluster_id FROM sc_border
),
sc_rest AS (
  SELECT n.url,
         CASE WHEN coalesce(h.nclu, 0) >= 2 THEN 'hub'
              ELSE 'outlier' END AS role,
         NULL::VARCHAR AS cluster_id
  FROM (SELECT DISTINCT src AS url FROM sym
        WHERE src NOT IN (SELECT url FROM sc_members)) n
  LEFT JOIN (
    SELECT s.src AS url, count(DISTINCT m.cluster_id) AS nclu
    FROM sym s JOIN sc_members m ON m.url = s.dst
    GROUP BY s.src
  ) h ON h.url = n.url
)
SELECT url, role, cluster_id FROM sc_members
UNION ALL
SELECT url, role, cluster_id FROM sc_rest
"""
