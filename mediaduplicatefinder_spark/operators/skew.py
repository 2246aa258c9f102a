"""Shuffle-key skew profile + salting advisor (E144): the north rule
says "partitioning / shuffle / skew handled explicitly" — the engine's
pair generators already cap hot LSH buckets (candidates.py) and the
docs explain WHY, but the decision input deserves to be a first-class
relation: before any big keyed shuffle (band join, per-host groupBy,
cluster-id agg), profile the key distribution and emit the action a
plan author (or an auto-tuner) needs.

Output per heavy key: its row count, its corpus share in integer ppm,
its rank, and the SALT FACTOR ``ceil(cnt / target_rows)`` — the number
of sub-keys that bound every salted partition at the target size
(join salting replicates the other side salt-ways; groupBy salting is
the classic two-phase partial agg). ``action`` spells it out:
``salt:N`` when a key overflows one target partition, else ``ok``.

Scale shape: the exact profile is ONE map-side-combining
groupBy(key) — after combine, at most |distinct keys| rows move, and
the stats/top-k run on that tiny relation. For open-domain keys where
even that is too much, the count-min sketch (E135, operators/cms.py)
gives the same heavy-hitter counts with bounded state — this operator
is the exact twin of that decision at auditable scale.

All derived quantities are integers (ppm by integer division, ceiling
by (a+b-1) div b), so the twin matches bit for bit.

Reference tie-in: none (single machine); SURVEY §2 E-series extension
formalizing the capped-bucket metrics the pipeline already publishes
(candidates.py bucket_cap overflow counters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PPM = 1_000_000


def skew_profile(
    df: DataFrame,
    key_col: str,
    target_rows: int = 100_000,
    top_k: int = 10,
) -> DataFrame:
    """(key, cnt, share_ppm, rk, salt, action): the ``top_k`` heaviest
    shuffle keys with their integer corpus share and the salt factor
    that bounds each salted partition at ``target_rows``."""
    counts = (
        df.select(F.col(key_col).cast("string").alias("key"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    stats = counts.agg(F.sum("cnt").alias("n_total"))
    # top-k via orderBy+limit (TakeOrderedAndProject: per-partition
    # heaps, driver merge of k rows) instead of a global row_number
    # window, which would single-partition ALL distinct keys; rk is
    # then a window over only the k survivors.
    w = Window.orderBy(F.col("cnt").desc(), F.col("key"))
    top = (
        counts.orderBy(F.col("cnt").desc(), F.col("key"))
        .limit(top_k)
        .withColumn("rk", F.row_number().over(w))
        .crossJoin(F.broadcast(stats))
    )
    return top.select(
        "key",
        "cnt",
        F.expr(f"(cnt * {PPM}) div n_total").alias("share_ppm"),
        "rk",
        F.expr(f"(cnt + {target_rows - 1}) div {target_rows}").alias("salt"),
        F.when(
            F.expr(f"(cnt + {target_rows - 1}) div {target_rows}") > 1,
            F.concat(
                F.lit("salt:"),
                F.expr(f"(cnt + {target_rows - 1}) div {target_rows}").cast(
                    "string"
                ),
            ),
        )
        .otherwise(F.lit("ok"))
        .alias("action"),
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    n_salt: int,
    salt_expr_col: str | None = None,
) -> DataFrame:
    """Skew-safe inner equi-join (E152): the textbook salted hash join
    the north rule names — the LEFT (fact) side's hot keys are spread
    over ``n_salt`` sub-keys and the RIGHT (dimension) side is
    replicated ``n_salt`` ways, so one boilerplate-heavy key can no
    longer pin a single reducer. Result is EXACTLY the plain inner
    join (the DuckDB twin is literally ``JOIN`` — salting is a
    physical rewrite, not a semantic one).

    ``salt_expr_col``: a left column whose xxhash64 spreads rows of
    the same key (defaults to the first non-key column). The salt is
    deterministic per row — reruns and retries land identically.

    When to use: cfg-level AQE skew handling splits oversized
    post-shuffle partitions on its own; the explicit form is for (a)
    aggregation-free joins where one key exceeds a single executor's
    memory BEFORE AQE can split it, and (b) plans where the salted key
    must survive into a downstream stage (the E144 profile's
    ``salt:N`` action says which keys and what N)."""
    scol = salt_expr_col or next(c for c in left.columns if c != key_col)
    l = left.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(scol)), F.lit(n_salt)).cast("int")
    )
    r = right.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    ).withColumn("__salt", F.col("__salt").cast("int"))
    return l.join(r, [key_col, "__salt"], "inner").drop("__salt")


def skew_profile_sql(
    key_col: str,
    target_rows: int = 100_000,
    top_k: int = 10,
    source: str = "events",
) -> str:
    """DuckDB twin — same integer divisions, same tie order."""
    return f"""WITH counts AS (
  SELECT CAST({key_col} AS VARCHAR) AS key, COUNT(*)::BIGINT AS cnt
  FROM {source} GROUP BY 1
),
stats AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_total FROM counts),
top AS (
  SELECT key, cnt,
         ROW_NUMBER() OVER (ORDER BY cnt DESC, key) AS rk
  FROM counts
)
SELECT t.key, t.cnt,
       (t.cnt * {PPM}) // s.n_total AS share_ppm,
       t.rk,
       (t.cnt + {target_rows - 1}) // {target_rows} AS salt,
       CASE WHEN (t.cnt + {target_rows - 1}) // {target_rows} > 1
            THEN 'salt:' || CAST((t.cnt + {target_rows - 1})
                                 // {target_rows} AS VARCHAR)
            ELSE 'ok' END AS action
FROM top t CROSS JOIN stats s
WHERE t.rk <= {top_k}"""
