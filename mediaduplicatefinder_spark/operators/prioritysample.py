"""Priority sampling for weighted subset selection (E205): Duffield /
Lund / Thorup, "Priority Sampling for Estimation of Arbitrary Subset
Sums" (JACM 2007).

The selection layer picks documents by hard gates (budget_selection
E26: quality-ranked prefix) or uniform hash gates (corpus_mix E29,
stratified sampling E141).  Weighted sampling WITHOUT replacement is
the missing published member: keep k documents per stratum with
inclusion probability increasing in a weight (quality, token count,
softdedup weight), while remaining able to UNBIASEDLY estimate any
subset's total weight from the sample — the property the DLT paper
proves (their estimator has zero covariance between items and at most
one effective "random" slot worse than the optimal VarOpt scheme).

Construction: priority q_i = w_i / u_i with u_i uniform in (0,1);
keep the k highest priorities; threshold τ = the (k+1)-th priority;
estimator ŵ_i = max(w_i, τ) for kept items (0 otherwise).

Determinism + cross-engine contract (why priorities, not the
Efraimidis–Spirakis u^(1/w) key): u_i is the pinned-XXH64 hash of the
16-byte doc key mapped to a dyadic rational — (hash >> 11) / 2^53 —
EXACT in both engines, and q = w / u is ONE IEEE division; the A-ES
exponentiation would cross libm pow()/log() whose last-ulp behavior
differs between the JVM and DuckDB.  Same sample every run, every
partitioning, both engines.  A zero-hash u (prob 2^-53 per item)
yields q = inf, which sorts first deterministically in both engines.

Shape: map-only weight + hash + priority, one per-stratum top-(k+1)
window (rank ≤ k+1 rows survive), τ via the per-stratum max over the
rank-(k+1) row — O(strata · k) after the window, corpus never
collected.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

TWO_53 = float(1 << 53)


def priority_sample(
    df: DataFrame,
    weight: Column,
    key: Column,
    group_cols: Sequence[str] = ("lang",),
    id_cols: Sequence[str] = ("doc_id",),
    k: int = 5,
) -> DataFrame:
    """df + weight expr + 16-byte-string key expr -> per-group top-k
    priority sample: (group..., id..., weight, priority, w_hat) with
    w_hat = max(weight, tau) the DLT subset-sum estimator term."""
    gcols = list(group_cols)
    icols = list(id_cols)
    u = (
        F.shiftrightunsigned(F.xxhash64(key), 11).cast("double")
        / F.lit(TWO_53)
    )
    # caller supplies an already-round-stable weight expression (e.g.
    # quality_score_expr, round 4) — no extra rounding here
    base = df.select(
        *gcols,
        *icols,
        weight.alias("weight"),
        (weight / u).alias("priority"),
    )
    w = Window.partitionBy(*gcols).orderBy(
        F.col("priority").desc(), *[F.col(c) for c in icols]
    )
    # persist: the tau branch and the kept branch both read this
    # relation; without the cut the window (and the corpus scan under
    # it) executes twice (plan-audited). O(strata * (k+1)) rows.
    ranked = (
        base.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k + 1)
        .localCheckpoint(eager=True)  # review r5: bounded, not pinned
    )
    tau = ranked.filter(F.col("rk") == k + 1).select(
        *gcols, F.col("priority").alias("tau")
    )
    return (
        ranked.filter(F.col("rk") <= k)
        .join(tau, gcols, "left")
        .select(
            *gcols,
            *icols,
            "weight",
            "priority",
            F.greatest(
                F.col("weight"), F.coalesce(F.col("tau"), F.lit(0.0))
            ).alias("w_hat"),
        )
    )


def priority_sample_sql(
    base_sql: str,
    group_cols: Sequence[str] = ("lang",),
    id_cols: Sequence[str] = ("doc_id",),
    k: int = 5,
) -> str:
    """DuckDB twin over ``base_sql`` -> (group..., id..., weight, dk)
    where dk = the pinned-XXH64 hash (UBIGINT) of the same key: the
    identical dyadic u, one division, one window, the same estimator."""
    g = ", ".join(group_cols)
    i = ", ".join(id_cols)
    io = ", ".join(f"{c} ASC" for c in id_cols)
    return f"""
WITH ps_base AS (
  SELECT {g}, {i}, weight,
         weight / ((dk >> 11)::DOUBLE / {TWO_53!r}) AS priority
  FROM ({base_sql})
),
ps_rk AS (
  SELECT *, row_number() OVER (PARTITION BY {g}
             ORDER BY priority DESC, {io}) AS rk
  FROM ps_base QUALIFY rk <= {k + 1}
),
ps_tau AS (
  SELECT {g}, priority AS tau FROM ps_rk WHERE rk = {k + 1}
)
SELECT {', '.join('r.' + c for c in group_cols)},
       {', '.join('r.' + c for c in id_cols)}, r.weight,
       r.priority, greatest(r.weight, coalesce(t.tau, 0.0)) AS w_hat
FROM ps_rk r LEFT JOIN ps_tau t USING ({g})
WHERE r.rk <= {k}
"""
