"""UniMax language-budget allocation (E203): Chung / Garcia / Roberts /
Constant / Tao et al., "UniMax: Fairer and More Effective Language
Sampling for Large-Scale Multilingual Pretraining" (ICLR 2023).

The training-prep layer already fixes WHICH documents survive
(budget_selection E26) and HOW corpora mix deterministically
(corpus_mix E29); UniMax is the published answer to the layer above:
given per-LANGUAGE token inventories n_l, a total training budget B,
and a repeat ceiling of E epochs per language (past which repetition
measurably hurts), how many tokens does each language get?  The paper's
greedy: visit languages smallest-first; give each min(E·n_l, fair
share of the remaining budget over the remaining languages).  Small
languages are fully used up to E epochs; large ones split what is left
uniformly — temperature sampling's head-crushing tail-starving tradeoff
disappears.

Closed form (what makes this ONE window pass instead of a sequential
loop): with languages ranked ascending by n_l, the decision function
f(i) = B − S_{i−1} − E·n_i·(L−i+1)  (S = prefix sum of E·n over capped
predecessors) satisfies f(i+1) − f(i) = E·(L−i)·(n_i − n_{i+1}) ≤ 0 —
monotone — so the capped prefix is exactly the rows with f(i) ≥ 0, and
every language after the crossing takes the SAME share (removing a
uniform share leaves the per-remaining-language share unchanged).
Deterministic integer variant (documented deviation): the uniform
share is floor((B − S_k)/(L − k)) computed ONCE at the crossing —
equal integer shares, remainder unallocated — so every quantity an
engine boundary crosses is BIGINT except the final epochs ratio
(one round-6 division, identical in both engines).

Shape: one groupBy(lang) map-side-combining count, then windows over
the O(languages) relation — metadata-grain (hundreds of rows for a
real crawl), so the unpartitioned window is a driver-sized final step,
the same altitude as compaction_plan / stats_rollup.  Corpus tokens
are never shuffled.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def unimax_budgets(
    lang_tokens: DataFrame,
    budget_num: int = 165,
    budget_den: int = 100,
    epochs_cap: int = 2,
) -> DataFrame:
    """lang_tokens(lang, n_tokens) -> (lang, n_tokens, alloc_rank,
    capped, budget_tokens, epochs): UniMax allocation of a budget of
    floor(total_tokens · budget_num / budget_den) tokens with at most
    ``epochs_cap`` epochs per language."""
    w = Window.orderBy(F.col("n_tokens").asc(), F.col("lang").asc())
    tot = lang_tokens.agg(
        F.count(F.lit(1)).alias("n_langs"),
        F.sum("n_tokens").alias("total_tokens"),
    )
    cap: Column = F.lit(epochs_cap) * F.col("n_tokens")
    ranked = (
        lang_tokens.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "n_tokens",
            "n_langs",
            F.expr(
                f"(total_tokens * {budget_num}) div {budget_den}"
            ).alias("budget"),
            F.row_number().over(w).alias("alloc_rank"),
            cap.alias("cap_tokens"),
        )
        .withColumn(
            "cum_prev",
            F.coalesce(
                F.sum("cap_tokens").over(
                    w.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .withColumn(
            "capped",
            F.col("cap_tokens")
            * (F.col("n_langs") - F.col("alloc_rank") + 1)
            <= F.col("budget") - F.col("cum_prev"),
        )
    )
    wa = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    shared = ranked.select(
        "lang",
        "n_tokens",
        "alloc_rank",
        "capped",
        "cap_tokens",
        "budget",
        "n_langs",
        F.sum(F.when(F.col("capped"), 1).otherwise(0)).over(wa).alias("k"),
        F.sum(F.when(F.col("capped"), F.col("cap_tokens")).otherwise(0))
        .over(wa)
        .alias("s_k"),
    )
    # greatest(...,1): when every language is capped the ELSE branch is
    # never selected; the guard only keeps the dead expression total
    share = F.expr("(budget - s_k) div greatest(n_langs - k, 1)")
    return shared.select(
        "lang",
        "n_tokens",
        "alloc_rank",
        "capped",
        F.when(F.col("capped"), F.col("cap_tokens"))
        .otherwise(share)
        .alias("budget_tokens"),
        F.round(
            F.when(F.col("capped"), F.col("cap_tokens"))
            .otherwise(share)
            .cast("double")
            / F.col("n_tokens"),
            6,
        ).alias("epochs"),
    )


def unimax_sql(
    counts_sql: str,
    budget_num: int = 165,
    budget_den: int = 100,
    epochs_cap: int = 2,
) -> str:
    """DuckDB twin over ``counts_sql`` -> (lang, n_tokens): identical
    ranking, integer-exact capped condition, once-at-crossing floor
    share, round-6 epochs."""
    return f"""
WITH um_counts AS ({counts_sql}),
um_tot AS (
  SELECT count(*) AS n_langs, sum(n_tokens)::BIGINT AS total_tokens
  FROM um_counts
),
um_ranked AS (
  SELECT c.lang, c.n_tokens, t.n_langs,
         (t.total_tokens * {budget_num}) // {budget_den} AS budget,
         row_number() OVER (ORDER BY c.n_tokens ASC, c.lang ASC)
           AS alloc_rank,
         {epochs_cap}::BIGINT * c.n_tokens AS cap_tokens
  FROM um_counts c, um_tot t
),
um_cum AS (
  SELECT *,
         coalesce(sum(cap_tokens) OVER (
           ORDER BY alloc_rank
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_prev
  FROM um_ranked
),
um_dec AS (
  SELECT *,
         cap_tokens * (n_langs - alloc_rank + 1) <= budget - cum_prev
           AS capped
  FROM um_cum
),
um_sh AS (
  SELECT *,
         sum(CASE WHEN capped THEN 1 ELSE 0 END) OVER () AS k,
         sum(CASE WHEN capped THEN cap_tokens ELSE 0 END) OVER () AS s_k
  FROM um_dec
)
SELECT lang, n_tokens, alloc_rank, capped,
       (CASE WHEN capped THEN cap_tokens
             ELSE (budget - s_k) // greatest(n_langs - k, 1)
        END)::BIGINT AS budget_tokens,
       round((CASE WHEN capped THEN cap_tokens
                   ELSE (budget - s_k) // greatest(n_langs - k, 1) END)::DOUBLE
             / n_tokens, 6) AS epochs
FROM um_sh
"""
