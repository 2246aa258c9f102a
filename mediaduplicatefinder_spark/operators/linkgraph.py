"""Host link graph + fixed-point PageRank (E77).

A crawl pipeline ranks hosts to prioritize fetching, weight quality
priors, and spot link farms (boilerplate link rings are also dedup
candidates).  Two stages:

1. **Link extraction** — `regexp_extract_all` over the raw html pulls
   anchor target hosts; with the page's own host (from its url) this
   yields a distinct host->host edge list, self-links dropped.  Pure
   column expressions: JVM-side, codegen, map-only until the edge
   distinct.
2. **PageRank** — the GraphFrames-style iterative DataFrame join:
   contribution pass (ranks ⨝ out-degrees ⨝ edges, groupBy dst) then
   re-base, repeated ``iters`` times.  Each iteration is ONE shuffle
   keyed on host; a production run persists ranks between iterations
   and checkpoints lineage every few rounds (plan depth grows
   linearly; see the flagship's localCheckpoint note).

Fixed-point integer arithmetic makes the ITERATIVE result bit-exact
cross-engine (the E68 k-means precedent): ranks are scaled by 10^12,
contributions use truncating integer division (Spark ``div`` ==
DuckDB ``//`` — NOT Python ``//``, which floors), and the damping
update is ``base + (85 * sum) div 100``.  The oracle unrolls the loop
as chained CTEs.  Hosts without outlinks contribute nothing (their
mass leaks — documented dangling-drop variant; the driver synthesis
gives every host outlinks so the rule stays inert there).

Overflow audit (ANSI mode: overflow throws, so this must hold):
sum of all ranks <= N * SCALE; with N <= ~4e6 hosts the damped sum
85 * N * SCALE stays under 2^63.  At web scale you would drop SCALE
to 10^9, which holds to N ~ 10^11 hosts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 10**12
PR_ITERS = 5


def _tdiv_const(a: int, b: int) -> int:
    """Truncating division for nonneg constants (== Spark div)."""
    return a // b
_HREF_RE = r'href="http://([^/"]+)'
_URL_RE = r"^http://([^/]+)"


def extract_host_links(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """pages(url, html) -> distinct (src, dst) host edges, self-links
    dropped."""
    src = F.regexp_extract(F.col(url_col), _URL_RE, 1)
    dst = F.explode(
        F.regexp_extract_all(F.col(html_col), F.lit(_HREF_RE), F.lit(1))
    )
    return (
        pages.select(src.alias("src"), dst.alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def pagerank_fixed(
    edges: DataFrame, iters: int = PR_ITERS, scale: int = PR_SCALE
) -> DataFrame:
    """Distinct (src, dst) edges -> (host, od, indeg, pr_scaled).

    pr_scaled is the integer fixed-point rank after ``iters`` damped
    iterations from a uniform start; od/indeg are the degree stats."""
    # the edge list (and everything derived from it) is re-read every
    # iteration: persist once or the html regex extraction re-runs
    # iters+2 times (the iterative-join lineage trap)
    edges = edges.persist()
    nodes = (
        edges.select(F.col("src").alias("host"))
        .union(edges.select(F.col("dst").alias("host")))
        .distinct()
        .persist()
    )
    odeg = edges.groupBy(F.col("src").alias("host")).agg(
        F.count(F.lit(1)).alias("od")
    ).persist()
    indeg = edges.groupBy(F.col("dst").alias("host")).agg(
        F.count(F.lit(1)).alias("indeg")
    )
    # mass-n convention: every node starts at SCALE and the teleport
    # term is (1-d)*SCALE, so per-node ranks hover near SCALE at ANY
    # graph size (the mass-1 convention's SCALE/n would lose all
    # fixed-point precision at 10^9 hosts).
    base = _tdiv_const(15 * scale, 100)

    ranks = nodes.select("host", F.lit(scale).cast("long").alias("r"))
    for _ in range(iters):
        contrib = (
            ranks.join(odeg, "host")
            .select("host", F.expr("r div od").alias("c"))
            .join(edges, F.col("host") == F.col("src"))
            .groupBy(F.col("dst").alias("host"))
            .agg(F.sum("c").alias("s"))
        )
        ranks = nodes.join(contrib, "host", "left").select(
            "host",
            (
                F.lit(base) + F.expr("(85 * coalesce(s, 0L)) div 100")
            ).alias("r"),
        )
    return (
        ranks.join(odeg, "host", "left")
        .join(indeg, "host", "left")
        .select(
            "host",
            F.coalesce("od", F.lit(0)).cast("long").alias("od"),
            F.coalesce("indeg", F.lit(0)).cast("long").alias("indeg"),
            F.col("r").alias("pr_scaled"),
        )
    )


def linkgraph_pagerank(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    return pagerank_fixed(extract_host_links(pages, url_col, html_col))


def linkgraph_pagerank_sql(
    pages_sql: str, iters: int = PR_ITERS, scale: int = PR_SCALE
) -> str:
    """DuckDB twin: same extraction regexes, the loop unrolled as
    chained CTEs with ``//`` (truncates toward zero == Spark div)."""
    ctes = [
        f"pages AS ({pages_sql})",
        f"""edges AS (
  SELECT DISTINCT src, dst FROM (
    SELECT regexp_extract(url, '{_URL_RE}', 1) AS src,
           unnest(regexp_extract_all(html, '{_HREF_RE}', 1)) AS dst
    FROM pages
  ) WHERE src <> dst
)""",
        """nodes AS (
  SELECT src AS host FROM edges UNION SELECT dst FROM edges
)""",
        "odeg AS (SELECT src AS host, count(*)::BIGINT AS od FROM edges GROUP BY src)",
        "ideg AS (SELECT dst AS host, count(*)::BIGINT AS indeg FROM edges GROUP BY dst)",
        f"r0 AS (SELECT host, {scale}::BIGINT AS r FROM nodes)",
    ]
    prev = "r0"
    for i in range(1, iters + 1):
        ctes.append(
            f"""c{i} AS (
  SELECT e.dst AS host, sum(p.r // o.od)::BIGINT AS s
  FROM {prev} p JOIN odeg o ON p.host = o.host
  JOIN edges e ON e.src = p.host
  GROUP BY e.dst
)"""
        )
        ctes.append(
            f"""r{i} AS (
  SELECT n.host,
         ({_tdiv_const(15 * scale, 100)}::BIGINT
          + (85 * coalesce(c.s, 0)) // 100)::BIGINT AS r
  FROM nodes n LEFT JOIN c{i} c ON n.host = c.host
)"""
        )
        prev = f"r{i}"
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT n.host, coalesce(o.od, 0)::BIGINT AS od,
       coalesce(i.indeg, 0)::BIGINT AS indeg, p.r AS pr_scaled
FROM nodes n
LEFT JOIN odeg o ON n.host = o.host
LEFT JOIN ideg i ON n.host = i.host
JOIN {prev} p ON n.host = p.host
"""
