"""Robust per-group outlier gating: lower-median + MAD (E89).

Length-based quality filters with fixed thresholds break the moment
the corpus mix shifts; the robust version — flag documents whose
length deviates from the GROUP median by more than k times the median
absolute deviation — is the standard scale-free gate (Hampel filter;
mean/stddev are useless under the heavy-tailed web length
distribution, one 10 MB page drags the mean past most of the corpus).

Everything stays integer, so the twin is a hard check: "median" is the
LOWER median (the element at rank ``(n+1) // 2`` under the total order
(value, doc_id)), MAD is the lower median of ``|x - med|`` under
(dev, doc_id), and the gate is the integer comparison
``dev > k * mad``.  Interpolated medians would drag floats in for
nothing a filter can observe.

Shape: two ranking windows keyed on the group — rank r over
(value, doc_id), pick rank (n+1)//2 — each one shuffle of (group,
int64) rows; the group medians broadcast back.  (At 10^12 rows a
production run swaps the exact rank for a fixed-width histogram
median; the rank formulation is the semantics both share.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MAD_K = 4


def robust_length_outliers(
    docs: DataFrame,
    grp_col: str = "lang",
    val_col: str = "n_chars",
    k: int = MAD_K,
) -> DataFrame:
    """docs(doc_id, grp, val) ->
    (doc_id, grp, val, med, dev, mad, is_outlier)."""
    d = docs.select(
        "doc_id",
        F.col(grp_col).alias("grp"),
        F.col(val_col).cast("long").alias("val"),
    )
    w1 = Window.partitionBy("grp").orderBy(
        F.col("val").asc(), F.col("doc_id").asc()
    )
    cnt = Window.partitionBy("grp")
    r1 = d.select(
        "*",
        F.row_number().over(w1).alias("rn"),
        F.count(F.lit(1)).over(cnt).alias("n"),
    )
    med = r1.filter(
        F.col("rn") == F.expr("(n + 1) div 2")
    ).select("grp", F.col("val").alias("med"))
    dv = d.join(med, "grp").select(
        "doc_id", "grp", "val", "med",
        F.abs(F.col("val") - F.col("med")).alias("dev"),
    )
    w2 = Window.partitionBy("grp").orderBy(
        F.col("dev").asc(), F.col("doc_id").asc()
    )
    r2 = dv.select(
        "*",
        F.row_number().over(w2).alias("rn"),
        F.count(F.lit(1)).over(cnt).alias("n"),
    )
    mad = r2.filter(
        F.col("rn") == F.expr("(n + 1) div 2")
    ).select("grp", F.col("dev").alias("mad"))
    return dv.join(mad, "grp").select(
        "doc_id",
        "grp",
        "val",
        "med",
        "dev",
        "mad",
        (F.col("dev") > F.lit(k) * F.col("mad")).alias("is_outlier"),
    )


def robust_length_outliers_sql(
    docs_sql: str = "SELECT doc_id, lang AS grp, n_chars AS val FROM documents",
    k: int = MAD_K,
) -> str:
    return f"""
WITH rs_in AS ({docs_sql}),
r1 AS (
  SELECT doc_id, grp, val,
         row_number() OVER (PARTITION BY grp
                            ORDER BY val ASC, doc_id ASC) AS rn,
         count(*) OVER (PARTITION BY grp) AS n
  FROM rs_in
),
med AS (SELECT grp, val AS med FROM r1 WHERE rn = (n + 1) // 2),
dv AS (
  SELECT i.doc_id, i.grp, i.val, m.med, abs(i.val - m.med) AS dev
  FROM rs_in i JOIN med m USING (grp)
),
r2 AS (
  SELECT doc_id, grp, dev,
         row_number() OVER (PARTITION BY grp
                            ORDER BY dev ASC, doc_id ASC) AS rn,
         count(*) OVER (PARTITION BY grp) AS n
  FROM dv
),
mad AS (SELECT grp, dev AS mad FROM r2 WHERE rn = (n + 1) // 2)
SELECT d.doc_id, d.grp, d.val, d.med, d.dev, a.mad,
       d.dev > {k} * a.mad AS is_outlier
FROM dv d JOIN mad a USING (grp)
"""
