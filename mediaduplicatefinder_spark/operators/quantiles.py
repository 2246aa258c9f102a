"""Mergeable log-grid quantile sketch (E143): the fourth member of the
engine's mergeable-sketch family — HLL (cardinality, E75), KMV
(cardinality+sample, E92), count-min (frequency, E135), and now
QUANTILES (distribution shape). Every published-pipeline threshold the
engine broadcasts as a constant — CCNet perplexity terciles, Gopher
length cuts, the budget-selection knee — is a quantile of a 10^12-row
column; computing it must not sort the corpus.

Design (deterministic, unlike t-digest/KLL whose merge is
order-dependent and therefore un-oracle-able):

- a fixed LOG-SPACED boundary grid (2 sub-bins per octave by default)
  covering [0, 2^40): bin(v) = index of the first boundary > v, found
  by counting smaller boundaries in a literal array — one
  whole-stage-codegen expression, no UDF, same literal array inlined
  in the SQL twin.
- the sketch is ``(group, bin, cnt)`` — ONE map-side-combining groupBy
  shuffling <= groups * n_bins partial rows; snapshots merge by
  cell-wise addition (associative ints, the CMS/HLL contract).
- quantile read-off: the first bin whose cumulative count reaches
  ``ceil(q * N)`` (the exact rank), reported as that bin's UPPER
  boundary — a guaranteed UPPER BOUND on the true quantile, within one
  bin (relative error <= the octave split, 2^(1/2)-1 ~ 41% at 2
  sub-bins; quadruple the grid for ~19%). All integers end to end.

Scale shape: map-only bin assignment; the sketch is tiny and the
read-off is a per-group window over <= n_bins rows. At 10^12 rows the
sketch is the ONLY thing that moves.

Reference tie-in: none (the reference never aggregates distributions);
SURVEY §2 E-series extension feeding E46/E26's broadcast-cutoff
pattern with a principled, mergeable estimator.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

SUB_BINS = 2  # sub-bins per octave
MAX_EXP = 40  # grid covers [0, 2^40)


def boundaries(sub_bins: int = SUB_BINS, max_exp: int = MAX_EXP) -> list[int]:
    """The shared literal grid: 0, then sub_bins log-spaced integer
    boundaries per octave [2^e, 2^(e+1)), strictly increasing (integer
    rounding collapses duplicates in the low octaves)."""
    bs = [0, 1]
    for e in range(max_exp):
        lo, hi = 1 << e, 1 << (e + 1)
        for s in range(1, sub_bins + 1):
            b = int(round(lo * (hi / lo) ** (s / sub_bins)))
            if b > bs[-1]:
                bs.append(b)
    return bs


def bin_expr(v: Column, bounds: list[int]) -> Column:
    """Index of the first boundary > v == count of boundaries <= v.
    Negative values clamp to bin 0; values past the grid to the last
    bin. One aggregate over a literal array — no UDF, no join."""
    arr = F.array(*[F.lit(int(b)).cast("long") for b in bounds])
    cnt = F.aggregate(
        arr,
        F.lit(0),
        lambda acc, b: acc + F.when(b <= v, F.lit(1)).otherwise(F.lit(0)),
    )
    return F.greatest(F.lit(0), cnt - F.lit(1))


def quantile_sketch(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    bounds: list[int] | None = None,
) -> DataFrame:
    """(group..., bin, cnt): the mergeable sketch — cell-wise addable
    across corpus snapshots."""
    bs = bounds if bounds is not None else boundaries()
    return (
        df.select(
            *group_cols,
            bin_expr(F.col(value_col).cast("long"), bs).alias("bin"),
        )
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def merge_sketches(a: DataFrame, b: DataFrame, group_cols: list[str]) -> DataFrame:
    """Cell-wise addition — the mergeability contract (pinned equal to
    a whole-corpus build by test)."""
    return (
        a.unionByName(b)
        .groupBy(*group_cols, "bin")
        .agg(F.sum("cnt").alias("cnt"))
    )


def quantile_estimates(
    sketch: DataFrame,
    group_cols: list[str],
    qs: list[float],
    bounds: list[int] | None = None,
) -> DataFrame:
    """(group..., q, est): per group, the upper boundary of the first
    bin whose cumulative count reaches ceil(q*N) — an upper bound on
    the true quantile within one bin's width."""
    bs = bounds if bounds is not None else boundaries()
    upper = F.array(*[F.lit(int(b)).cast("long") for b in bs[1:] + [bs[-1]]])
    w = Window.partitionBy(*group_cols).orderBy("bin")
    cum = sketch.select(
        *group_cols,
        "bin",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(
            Window.partitionBy(*group_cols).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    out = None
    for q in qs:
        qi = int(round(q * 1000))
        # exact integer ceiling rank: (n*qi + 999) // 1000
        rank = F.floor((F.col("n") * F.lit(qi) + F.lit(999)) / F.lit(1000)).cast(
            "long"
        )
        hit = cum.filter(F.col("cum") >= rank).groupBy(*group_cols).agg(
            F.min("bin").alias("bin")
        )
        est = hit.select(
            *group_cols,
            F.lit(qi).alias("q_mille"),
            F.element_at(upper, F.col("bin") + 1).alias("est"),
        )
        out = est if out is None else out.unionByName(est)
    return out


def quantile_sketch_sql(
    qs: list[float],
    value_col: str = "n_chars",
    group_col: str = "lang",
    source: str = "documents",
    bounds: list[int] | None = None,
) -> str:
    """DuckDB twin of sketch-build + read-off over the same literal
    grid (list_sum over the boundary comparisons == the fold)."""
    bs = bounds if bounds is not None else boundaries()
    blist = "[" + ", ".join(str(b) for b in bs) + "]::BIGINT[]"
    ulist = "[" + ", ".join(str(b) for b in bs[1:] + [bs[-1]]) + "]::BIGINT[]"
    q_rows = ", ".join(f"({int(round(q * 1000))})" for q in qs)
    return f"""WITH vals AS (
  SELECT {group_col} AS grp, CAST({value_col} AS BIGINT) AS v FROM {source}
),
binned AS (
  SELECT grp,
         GREATEST(0,
           list_sum(list_transform({blist},
                                   b -> CASE WHEN b <= v THEN 1 ELSE 0 END))
             - 1) AS bkt
  FROM vals
),
sk AS (SELECT grp, bkt, COUNT(*)::BIGINT AS cnt FROM binned GROUP BY 1, 2),
cum AS (
  SELECT grp, bkt,
         CAST(SUM(cnt) OVER (PARTITION BY grp ORDER BY bkt) AS BIGINT) AS cum,
         CAST(SUM(cnt) OVER (PARTITION BY grp) AS BIGINT) AS n
  FROM sk
),
qs(q_mille) AS (VALUES {q_rows}),
hit AS (
  SELECT c.grp, q.q_mille, MIN(c.bkt) AS bkt
  FROM cum c CROSS JOIN qs q
  WHERE c.cum >= (c.n * q.q_mille + 999) // 1000
  GROUP BY 1, 2
)
SELECT grp AS {group_col}, CAST(q_mille AS INTEGER) AS q_mille,
       ({ulist})[CAST(bkt + 1 AS BIGINT)] AS est
FROM hit"""
