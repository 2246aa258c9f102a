"""Pair-counting clustering agreement — Rand / Adjusted Rand / pair
P-R-F1 (E181): Rand JASA'71; Hubert/Arabie "Comparing partitions"
(Journal of Classification, 1985) for the adjusted index.

The dedup engine's EVALUATION operator: every tuning decision
(Jaccard threshold, band config, channel mix, SCAN ε) changes the
cluster partition, and "how different are two partitions" is the
question behind threshold sweeps, A/B runs of two configs, and
regression gates between engine versions. Pair counting is the form
that matches dedup semantics exactly — a partition IS its dup-pair
set — and, unlike NMI, it is rational arithmetic end to end, so the
DuckDB twin value-checks it exactly (no cross-engine log()).

Definitions over the contingency table n_ij of items co-labeled
(cluster i in A, cluster j in B), with pair counts P(x) = x(x-1)/2:

- pairs_both  = Σ_ij P(n_ij)   (pairs together in BOTH partitions)
- pairs_a     = Σ_i  P(a_i),  pairs_b = Σ_j P(b_j)
- Rand        = (T + 2·pairs_both − pairs_a − pairs_b) / T,
                T = P(n)      (agreeing pairs / all pairs)
- ARI         = 2·(T·pairs_both − pairs_a·pairs_b)
                / (T·(pairs_a+pairs_b) − 2·pairs_a·pairs_b)
                (Hubert-Arabie, cleared of the /T expectation — an
                 EXACT integer ratio, rounded to 9dp as a double)
- pair precision/recall/F1 of B against A:
                prec = pairs_both/pairs_b, rec = pairs_both/pairs_a,
                F1 = 2·pairs_both/(pairs_a+pairs_b)

Degenerate cases -> NULL: ARI's denominator is 0 when both
partitions are all-singletons or both are one-cluster (the index is
undefined there — Hubert/Arabie §2); ratios with zero denominators
are NULL likewise.

Integer-exactness at scale: the cleared ARI numerator is O(n⁴) and
overflows int64 beyond n ~ 50k items, so the counts are carried in
DECIMAL(38,0) (Spark) / HUGEINT-compatible DECIMAL (DuckDB) — exact
to n ~ 3·10⁹ items. Beyond that the engine's relative error is the
final double division only; the twin pins the exact path at test
scale. Shape: one inner join on item + three map-side-combining
groupBys — no pair materialization anywhere (the WHOLE POINT of pair
counting via the contingency table: Σ P(n_ij) counts pairs without
generating them).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,0)"


def _p2(col):
    """pair count C(x, 2) in wide decimal."""
    c = F.col(col).cast(_DEC)
    return (c * (c - 1) / 2).cast(_DEC)


def clustering_agreement(a: DataFrame, b: DataFrame) -> DataFrame:
    """a(item, cluster), b(item, cluster) -> one row:
    (n_items, n_clusters_a, n_clusters_b, pairs_both, pairs_a,
    pairs_b, rand_index, ari, pair_precision, pair_recall, pair_f1).
    Items are the INNER join of the two labelings (agreement is only
    defined on co-labeled items)."""
    j = (
        a.select(F.col("item"), F.col("cluster").alias("ca"))
        .join(
            b.select(F.col("item"), F.col("cluster").alias("cb")),
            "item",
        )
    )
    cont = j.groupBy("ca", "cb").agg(F.count("*").alias("n"))
    per_a = j.groupBy("ca").agg(F.count("*").alias("n"))
    per_b = j.groupBy("cb").agg(F.count("*").alias("n"))

    both = cont.agg(
        F.sum(_p2("n")).cast(_DEC).alias("pairs_both"),
    )
    aa = per_a.agg(
        F.sum(_p2("n")).cast(_DEC).alias("pairs_a"),
        F.count("*").cast("long").alias("n_clusters_a"),
        F.sum("n").cast(_DEC).alias("n_items"),
    )
    bb = per_b.agg(
        F.sum(_p2("n")).cast(_DEC).alias("pairs_b"),
        F.count("*").cast("long").alias("n_clusters_b"),
    )
    g = aa.crossJoin(bb).crossJoin(both)  # three one-row aggregates

    n = F.col("n_items")
    t = (n * (n - 1) / 2).cast(_DEC)
    pb, pa, pbb = F.col("pairs_both"), F.col("pairs_a"), F.col("pairs_b")
    ari_num = 2 * (t * pb - pa * pbb)
    ari_den = t * (pa + pbb) - 2 * pa * pbb

    def ratio(num, den):
        # cast the EXACT decimal operands to double, then divide:
        # decimal/decimal result scale differs between engines, while
        # decimal->double is correctly rounded in both — identical
        # inputs give identical doubles
        return F.when(
            den != 0,
            F.round(num.cast("double") / den.cast("double"), 9),
        ).otherwise(F.lit(None).cast("double"))

    return g.select(
        n.cast("long").alias("n_items"),
        "n_clusters_a",
        "n_clusters_b",
        pb.cast("long").alias("pairs_both"),
        pa.cast("long").alias("pairs_a"),
        pbb.cast("long").alias("pairs_b"),
        ratio(t + 2 * pb - pa - pbb, t).alias("rand_index"),
        ratio(ari_num, ari_den).alias("ari"),
        ratio(pb, pbb).alias("pair_precision"),
        ratio(pb, pa).alias("pair_recall"),
        ratio(2 * pb, pa + pbb).alias("pair_f1"),
    )


def clustering_agreement_sql(a_sql: str, b_sql: str) -> str:
    """DuckDB twin; ``a_sql``/``b_sql`` each select (item, cluster)
    (they may carry their own WITH — they are wrapped as derived
    tables)."""
    return f"""
WITH ja AS MATERIALIZED (
  SELECT a.item, a.cluster AS ca, b.cluster AS cb
  FROM ({a_sql}) a JOIN ({b_sql}) b USING (item)
),
cont AS (
  SELECT (n::DECIMAL(38,0) * (n - 1) / 2) AS p
  FROM (SELECT count(*) AS n FROM ja GROUP BY ca, cb)
),
pera AS (
  SELECT (n::DECIMAL(38,0) * (n - 1) / 2) AS p, n
  FROM (SELECT count(*) AS n FROM ja GROUP BY ca)
),
perb AS (
  SELECT (n::DECIMAL(38,0) * (n - 1) / 2) AS p
  FROM (SELECT count(*) AS n FROM ja GROUP BY cb)
),
g AS (
  SELECT
    (SELECT coalesce(sum(n), 0)::DECIMAL(38,0) FROM pera) AS n_items,
    (SELECT count(*)::BIGINT FROM pera) AS n_clusters_a,
    (SELECT count(*)::BIGINT FROM perb) AS n_clusters_b,
    (SELECT coalesce(sum(p), 0)::DECIMAL(38,0) FROM cont) AS pb,
    (SELECT coalesce(sum(p), 0)::DECIMAL(38,0) FROM pera) AS pa,
    (SELECT coalesce(sum(p), 0)::DECIMAL(38,0) FROM perb) AS pbb
)
SELECT
  n_items::BIGINT AS n_items,
  n_clusters_a, n_clusters_b,
  pb::BIGINT AS pairs_both,
  pa::BIGINT AS pairs_a,
  pbb::BIGINT AS pairs_b,
  CASE WHEN t <> 0 THEN round((t + 2*pb - pa - pbb)::DOUBLE / t::DOUBLE, 9) END
    AS rand_index,
  CASE WHEN (t*(pa+pbb) - 2*pa*pbb) <> 0
       THEN round((2*(t*pb - pa*pbb))::DOUBLE
            / (t*(pa+pbb) - 2*pa*pbb)::DOUBLE, 9) END
    AS ari,
  CASE WHEN pbb <> 0 THEN round(pb::DOUBLE / pbb::DOUBLE, 9) END AS pair_precision,
  CASE WHEN pa <> 0 THEN round(pb::DOUBLE / pa::DOUBLE, 9) END AS pair_recall,
  CASE WHEN (pa + pbb) <> 0
       THEN round((2*pb)::DOUBLE / (pa + pbb)::DOUBLE, 9) END
    AS pair_f1
FROM (SELECT *, (n_items * (n_items - 1) / 2)::DECIMAL(38,0) AS t FROM g)
"""
