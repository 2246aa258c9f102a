"""Two-Phase connected components — alternating Large-Star/Small-Star
(E180): Kiveris/Lattanzi/Mirrokni/Rastogi/Vassilvitskii, "Connected
Components in MapReduce and Beyond" (SoCC'14).

Why a SECOND CC implementation when clustering.connected_components
(min-label propagation + pointer jumping) already drives the
pipeline: the cluster labeling is the single most load-bearing stage
of the dedup engine — every downstream keeper/action/ledger decision
rides on it — and the two published algorithms converge to the same
fixpoint (min-node-rooted stars) through entirely different
intermediate states, so running BOTH and asserting label equality is
an algorithmic cross-check no amount of testing one implementation
gives. The SoCC'14 algorithm also carries a different scale profile:
its per-round shuffle REPLACES the edge set (monotonically shrinking
toward one star edge per node) instead of joining a static edge
table against a label table every round, which wins when the input
edge list is much larger than the node set (boilerplate-heavy crawl
graphs) — the paper's O(log² n) round bound is the trade.

Algorithm (paper §3, node order = string order of urls — any total
order works; url order matches the engine's min-url cluster_id
contract):

- Large-Star(u): for every neighbor v > u, replace (u,v) with
  (v, m(u)) where m(u) = min(Γ(u) ∪ {u}) — strictly-larger
  neighbors re-hang under u's minimum.
- Small-Star(u): for every neighbor v <= u (edges taken in
  big->small orientation) plus u itself, emit (v, m(u)) — u and its
  smaller neighbors all hang under the minimum.
- Alternate until the edge set is stable; the fixpoint is a forest
  of stars rooted at each component's minimum node (paper Thm 1–2).

DataFrame shape per round: one symmetric explode + one groupBy-min
(map-side combining) + one broadcast-free hash join + distinct — the
m(u) table is keyed on u, never wider than the node set. Stability
check = one count over a checksum aggregate (xxhash64 sum + count;
a checksum false-stop is 2^-64 and the labels oracle would catch
it). localCheckpoint per round truncates lineage (the CC-loop
convention, clustering.py).

Output contract matches connected_components: labels(url,
cluster_id) over nodes with degree >= 1, cluster_id = component min.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _min_table(sym: DataFrame) -> DataFrame:
    """m(u) = min over Γ(u) ∪ {u} for every node u of the symmetric
    edge relation sym(src, dst)."""
    return (
        sym.groupBy("src")
        .agg(F.min("dst").alias("__mind"))
        .select("src", F.least("__mind", "src").alias("m"))
    )


def _large_star(edges: DataFrame) -> DataFrame:
    sym = edges.select(
        F.col("u").alias("src"), F.col("v").alias("dst")
    ).unionByName(edges.select(F.col("v").alias("src"), F.col("u").alias("dst")))
    m = _min_table(sym)
    return (
        sym.filter(F.col("dst") > F.col("src"))
        .join(m, "src")
        .select(F.col("dst").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    # big -> small orientation: src = max endpoint, dst = min endpoint
    oriented = edges.select(
        F.greatest("u", "v").alias("src"), F.least("u", "v").alias("dst")
    )
    m = oriented.groupBy("src").agg(F.min("dst").alias("m"))
    hang = (
        oriented.join(m, "src")
        .select(F.col("dst").alias("u"), F.col("m").alias("v"))
    )
    self_rows = m.select(F.col("src").alias("u"), F.col("m").alias("v"))
    return (
        hang.unionByName(self_rows)
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def twophase_cc(edges: DataFrame, max_iterations: int = 50) -> DataFrame:
    """edges(url_a, url_b) -> labels(url, cluster_id); same contract
    as clustering.connected_components (degree >= 1 nodes only,
    cluster_id = min url of the component)."""

    def checksum(df: DataFrame) -> tuple:
        row = df.agg(
            F.count("*").alias("c"),
            # decimal sum: int64 hash sums overflow under ANSI mode
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).collect()[0]
        return (row["c"], row["h"])

    cur = (
        edges.select(F.col("url_a").alias("u"), F.col("url_b").alias("v"))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev_sum = checksum(cur)
    for _ in range(max_iterations):
        cur = _small_star(_large_star(cur)).localCheckpoint(eager=True)
        cur_sum = checksum(cur)
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    # fixpoint: stars (member, root). A root appears only on the v side.
    return (
        cur.select(F.col("u").alias("url"), F.col("v").alias("cluster_id"))
        .unionByName(
            cur.select(F.col("v").alias("url"), F.col("v").alias("cluster_id"))
        )
        .groupBy("url")
        .agg(F.min("cluster_id").alias("cluster_id"))
    )


def cc_labels_tail_sql() -> str:
    """Oracle tail over the dedup twin's ``sym`` CTE (lsh_sql
    _exact_and_edges_ctes): min-label transitive closure — the
    algorithm-independent DEFINITION of the component labeling both
    CC implementations must produce."""
    return """
, reach AS (
  SELECT src AS url, src AS lab FROM sym
  UNION
  SELECT s.dst, r.lab FROM reach r JOIN sym s ON s.src = r.url
)
SELECT url, min(lab) AS cluster_id FROM reach GROUP BY url
"""
