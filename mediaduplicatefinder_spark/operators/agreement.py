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

    # coalesce(sum, 0): an empty co-labeled universe (disjoint item
    # keys, or one empty labeling) makes every SUM NULL while the
    # DuckDB twin emits coalesce(...,0) — align on 0 (review r5)
    zero = F.lit(0).cast(_DEC)
    both = cont.agg(
        F.coalesce(F.sum(_p2("n")).cast(_DEC), zero).alias("pairs_both"),
    )
    aa = per_a.agg(
        F.coalesce(F.sum(_p2("n")).cast(_DEC), zero).alias("pairs_a"),
        F.count("*").cast("long").alias("n_clusters_a"),
        F.coalesce(F.sum("n").cast(_DEC), zero).alias("n_items"),
    )
    bb = per_b.agg(
        F.coalesce(F.sum(_p2("n")).cast(_DEC), zero).alias("pairs_b"),
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


# ------------------------------------------------------------- B-cubed

BCUBED_SCALE = 10**9


def bcubed_agreement(a: DataFrame, b: DataFrame) -> DataFrame:
    """B-cubed precision/recall/F of partition ``b`` against gold
    ``a`` (E199): Bagga/Baldwin COLING'98; Amigó et al. (Information
    Retrieval 2009) — the ITEM-weighted cluster metric family, the
    published complement to pair counting (E181): pair metrics weight
    a cluster's contribution quadratically (one 10k-doc boilerplate
    blob dominates every pair count), B-cubed weights each DOCUMENT
    once, so long-tail small clusters actually move the number. Amigó
    shows B-cubed uniquely satisfies all four formal constraints
    (homogeneity, completeness, rag bag, cluster-size vs quantity) —
    the reason it complements rather than duplicates ARI.

    Per item i: precision(i) = |C_b(i) ∩ C_a(i)| / |C_b(i)|,
    recall(i) = |C_b(i) ∩ C_a(i)| / |C_a(i)|; the reported P/R are
    item-averages and F is the harmonic mean of the averages (the
    standard formulation).

    Contingency identity (no per-item work, no pair explosion):
    Σ_i precision(i) = Σ_j (Σ_i n_ij²) / b_j over candidate clusters
    j, and symmetrically for recall over gold clusters — one join on
    item + two map-side-combining groupBys, the E181 shape.

    Cross-engine exactness: a sum of rationals with heterogeneous
    denominators is float-addition-order-dependent, so the engine
    pins a FIXED-POINT definition — each cluster's term is truncated
    to BCUBED_SCALE (10^9) fixed point via exact integer division
    (Spark ``div`` on DECIMAL(38,0) == DuckDB HUGEINT ``//``), summed
    exactly as integers, divided once at the end.  Truncation error
    is < n_clusters/(SCALE·n) — below the 9dp rounding for any
    corpus; overflow audit: per-term <= b_j·SCALE, total <= n·SCALE
    (fits int64 to n ~ 9·10^9 items; the decimal dividend n²·SCALE
    stays under 10^38 to n ~ 3·10^14)."""
    j = a.select(F.col("item"), F.col("cluster").alias("ca")).join(
        b.select(F.col("item"), F.col("cluster").alias("cb")), "item"
    )
    cont = j.groupBy("ca", "cb").agg(F.count("*").alias("n"))
    n2 = (F.col("n").cast(_DEC) * F.col("n").cast(_DEC)).alias("n2")

    def side_sum(group_col, alias):
        sizes = j.groupBy(group_col).agg(F.count("*").alias("gn"))
        s2 = cont.groupBy(group_col).agg(F.sum(n2).cast(_DEC).alias("s2"))
        return (
            s2.join(sizes, group_col)
            .select(
                F.expr(
                    f"CAST(s2 * {BCUBED_SCALE} AS DECIMAL(38,0))"
                    " div CAST(gn AS DECIMAL(38,0))"
                ).alias("term")
            )
            .agg(F.sum("term").cast(_DEC).alias(alias))
        )

    tot = j.agg(F.count("*").cast(_DEC).alias("n_items"))
    g = (
        tot.crossJoin(side_sum("cb", "sp_scaled"))
        .crossJoin(side_sum("ca", "sr_scaled"))
    )
    n, sp, sr = F.col("n_items"), F.col("sp_scaled"), F.col("sr_scaled")
    den = n * BCUBED_SCALE

    def ratio(num, d):
        return F.when(
            d != 0, F.round(num.cast("double") / d.cast("double"), 9)
        ).otherwise(F.lit(None).cast("double"))

    return g.select(
        n.cast("long").alias("n_items"),
        sp.cast("long").alias("sp_scaled"),
        sr.cast("long").alias("sr_scaled"),
        ratio(sp, den).alias("bcubed_precision"),
        ratio(sr, den).alias("bcubed_recall"),
        ratio(2 * sp * sr, (sp + sr) * den).alias("bcubed_f1"),
    )


def bcubed_agreement_sql(a_sql: str, b_sql: str) -> str:
    """DuckDB twin of :func:`bcubed_agreement` (HUGEINT ``//`` ==
    Spark DECIMAL ``div`` on the nonnegative terms)."""
    return f"""
WITH jb AS MATERIALIZED (
  SELECT a.item, a.cluster AS ca, b.cluster AS cb
  FROM ({a_sql}) a JOIN ({b_sql}) b USING (item)
),
bcont AS MATERIALIZED (
  SELECT ca, cb, count(*)::HUGEINT AS n FROM jb GROUP BY ca, cb
),
bp AS (
  SELECT sum((s2 * {BCUBED_SCALE}) // gn)::HUGEINT AS sp
  FROM (SELECT cb, sum(n * n)::HUGEINT AS s2 FROM bcont GROUP BY cb) s
  JOIN (SELECT cb, count(*)::HUGEINT AS gn FROM jb GROUP BY cb) g USING (cb)
),
br AS (
  SELECT sum((s2 * {BCUBED_SCALE}) // gn)::HUGEINT AS sr
  FROM (SELECT ca, sum(n * n)::HUGEINT AS s2 FROM bcont GROUP BY ca) s
  JOIN (SELECT ca, count(*)::HUGEINT AS gn FROM jb GROUP BY ca) g USING (ca)
),
bg AS (
  SELECT (SELECT count(*)::HUGEINT FROM jb) AS n,
         (SELECT sp FROM bp) AS sp, (SELECT sr FROM br) AS sr
)
SELECT
  n::BIGINT AS n_items,
  sp::BIGINT AS sp_scaled,
  sr::BIGINT AS sr_scaled,
  CASE WHEN n <> 0
       THEN round(sp::DOUBLE / (n * {BCUBED_SCALE})::DOUBLE, 9) END
    AS bcubed_precision,
  CASE WHEN n <> 0
       THEN round(sr::DOUBLE / (n * {BCUBED_SCALE})::DOUBLE, 9) END
    AS bcubed_recall,
  CASE WHEN (sp + sr) * n <> 0
       THEN round((2 * sp * sr)::DOUBLE
            / ((sp + sr) * n * {BCUBED_SCALE})::DOUBLE, 9) END
    AS bcubed_f1
FROM bg
"""


# ----------------------------------------------------------- purity


def purity_agreement(a: DataFrame, b: DataFrame) -> DataFrame:
    """Purity / inverse purity / their harmonic F of partition ``b``
    against gold ``a`` (E201): the third member of the cluster-metric
    canon (Zhao/Karypis 2001; the baseline pair Amigó et al. IR'09
    compares B-cubed against — shipped alongside E181 pair counting
    and E199 B-cubed so threshold sweeps can report all three families
    from one relation).

    purity       = Σ_j max_i n_ij / n   (each candidate cluster votes
                                         its dominant gold cluster)
    inverse      = Σ_i max_j n_ij / n   (and vice versa)
    purity_f1    = harmonic mean of the two.

    Unlike B-cubed there are no per-cluster rationals — both numerators
    are plain integer sums of contingency maxima, so the only float is
    the final division: integer-exact cross-engine with NO fixed-point
    machinery.  Known blind spot (the reason B-cubed exists): purity
    is 1.0 for all-singleton candidates; report the trio together.
    Shape: the E181 contingency join + two max-groupBys."""
    j = a.select(F.col("item"), F.col("cluster").alias("ca")).join(
        b.select(F.col("item"), F.col("cluster").alias("cb")), "item"
    )
    cont = j.groupBy("ca", "cb").agg(F.count("*").alias("n"))
    pur = cont.groupBy("cb").agg(F.max("n").alias("mx")).agg(
        F.sum("mx").cast(_DEC).alias("pur_num")
    )
    inv = cont.groupBy("ca").agg(F.max("n").alias("mx")).agg(
        F.sum("mx").cast(_DEC).alias("inv_num")
    )
    tot = j.agg(F.count("*").cast(_DEC).alias("n_items"))
    g = tot.crossJoin(pur).crossJoin(inv)
    n = F.col("n_items")
    p, i = F.col("pur_num"), F.col("inv_num")

    def ratio(num, den):
        return F.when(
            den != 0, F.round(num.cast("double") / den.cast("double"), 9)
        ).otherwise(F.lit(None).cast("double"))

    return g.select(
        n.cast("long").alias("n_items"),
        p.cast("long").alias("purity_num"),
        i.cast("long").alias("inverse_num"),
        ratio(p, n).alias("purity"),
        ratio(i, n).alias("inverse_purity"),
        ratio(2 * p * i, (p + i) * n).alias("purity_f1"),
    )


def purity_agreement_sql(a_sql: str, b_sql: str) -> str:
    """DuckDB twin of :func:`purity_agreement`."""
    return f"""
WITH jp2 AS MATERIALIZED (
  SELECT a.item, a.cluster AS ca, b.cluster AS cb
  FROM ({a_sql}) a JOIN ({b_sql}) b USING (item)
),
pcont AS MATERIALIZED (
  SELECT ca, cb, count(*)::HUGEINT AS n FROM jp2 GROUP BY ca, cb
),
pg AS (
  SELECT (SELECT count(*)::HUGEINT FROM jp2) AS n,
         (SELECT sum(mx)::HUGEINT FROM
            (SELECT cb, max(n) AS mx FROM pcont GROUP BY cb)) AS p,
         (SELECT sum(mx)::HUGEINT FROM
            (SELECT ca, max(n) AS mx FROM pcont GROUP BY ca)) AS i
)
SELECT
  n::BIGINT AS n_items,
  p::BIGINT AS purity_num,
  i::BIGINT AS inverse_num,
  CASE WHEN n <> 0 THEN round(p::DOUBLE / n::DOUBLE, 9) END AS purity,
  CASE WHEN n <> 0 THEN round(i::DOUBLE / n::DOUBLE, 9) END
    AS inverse_purity,
  CASE WHEN (p + i) * n <> 0
       THEN round((2 * p * i)::DOUBLE / ((p + i) * n)::DOUBLE, 9) END
    AS purity_f1
FROM pg
"""
