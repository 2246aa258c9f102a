"""Deterministic stratified sampling (E141): the corpus-QA primitive —
carve eval/audit/inspection slices per stratum (language, source,
quality bucket) from a 10^12-doc corpus WITHOUT randomness, full
sorts, or driver state.

Two samplers, two scale shapes:

- ``stratified_sample_fraction`` — keep a row iff
  ``h60(key) % DENOM < rate(stratum) * DENOM``. MAP-ONLY: no shuffle,
  no RNG seed to persist, no coordination — re-running on a grown
  corpus keeps exactly the previously-kept rows (the resume/idempotency
  property `rand() < p` can never give), and disjoint slices come free
  by windowing the hash range. This is the 100 TB default.
- ``stratified_sample_exact`` — exactly n(stratum) rows per stratum,
  the smallest-hash ones: one shuffle keyed by stratum +
  a row_number window. Deterministic and stable under corpus growth in
  the weaker sense (a new doc displaces at most one old pick). Use for
  fixed-size eval sets; the per-stratum partition is the natural skew
  bound (a stratum's window sees only its own rows — at extreme skew
  pre-aggregate with the E26 two-phase prefix-sum pattern instead).

Hash = the engine's cross-engine md5-60bit idiom (rendezvous.py /
cms.py): ``conv(substr(md5(key), 1, 15), 16, 10)`` — both engines agree
hash-for-hash, so the SAMPLE ITSELF is the oracle-checked artifact,
not just its size.

Reference tie-in: none in the reference (its corpus fits one screen);
this is SURVEY §2's E-series extension — the inspection path every
published pipeline (C4, CCNet, Gopher appendix tables) runs before
shipping a corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DENOM = 1_000_000


def h60(key: Column) -> Column:
    """60-bit md5-prefix hash — cross-engine (DuckDB:
    ('0x' || substr(md5(x),1,15))::BIGINT)."""
    return F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")


def _rate_col(strata: Column, rates: dict[str, float], default: float) -> Column:
    expr = F.lit(int(round(default * DENOM)))
    for s, r in sorted(rates.items()):
        expr = F.when(strata == s, F.lit(int(round(r * DENOM)))).otherwise(expr)
    return expr


def stratified_sample_fraction(
    docs: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    key_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Input rows + (bucket, kept): map-only hash-threshold sampling at
    per-stratum rates. ``kept`` marks the sample; callers filter on it
    (returned unfiltered so audits can verify the complement too)."""
    bucket = F.pmod(h60(F.col(key_col).cast("string")), F.lit(DENOM))
    return docs.withColumn("bucket", bucket).withColumn(
        "kept",
        F.col("bucket") < _rate_col(F.col(strata_col), rates, default_rate),
    )


def stratified_sample_exact(
    docs: DataFrame,
    strata_col: str,
    counts: dict[str, int],
    key_col: str = "doc_id",
    default_n: int = 0,
) -> DataFrame:
    """Exactly n(stratum) rows per stratum — the min-hash-ranked ones
    (ties by key, impossible at 60 bits but pinned). Output adds
    ``rk`` (1-based within stratum)."""
    n_expr = F.lit(int(default_n))
    for s, n in sorted(counts.items()):
        n_expr = F.when(F.col(strata_col) == s, F.lit(int(n))).otherwise(n_expr)
    h = h60(F.col(key_col).cast("string"))
    w = Window.partitionBy(strata_col).orderBy(h, F.col(key_col))
    return (
        docs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= n_expr)
    )


def stratified_sample_report(
    docs: DataFrame,
    strata_col: str,
    rates: dict[str, float],
    counts: dict[str, int],
    key_col: str = "doc_id",
) -> DataFrame:
    """Both samplers over the same hash, unfiltered — (key, stratum,
    bucket, kept, exact_rk): the audit relation (the complement is as
    checkable as the sample)."""
    h = h60(F.col(key_col).cast("string"))
    n_expr = F.lit(0)
    for s, n in sorted(counts.items()):
        n_expr = F.when(F.col(strata_col) == s, F.lit(int(n))).otherwise(n_expr)
    w = Window.partitionBy(strata_col).orderBy(h, F.col(key_col))
    rk = F.row_number().over(w)
    return docs.select(
        key_col,
        strata_col,
        F.pmod(h, F.lit(DENOM)).alias("bucket"),
        (
            F.pmod(h, F.lit(DENOM))
            < _rate_col(F.col(strata_col), rates, 0.0)
        ).alias("kept"),
        F.when(rk <= n_expr, rk).alias("exact_rk"),
    )


def stratified_sample_sql(
    rates: dict[str, float],
    counts: dict[str, int],
    strata_col: str = "lang",
    key_col: str = "doc_id",
    source: str = "documents",
) -> str:
    """DuckDB twin of the combined query (fraction flag + exact-n rank
    side by side over the same hash)."""
    rate_case = " ".join(
        f"WHEN '{s}' THEN {int(round(r * DENOM))}" for s, r in sorted(rates.items())
    )
    n_case = " ".join(f"WHEN '{s}' THEN {n}" for s, n in sorted(counts.items()))
    return f"""WITH h AS (
  SELECT {key_col}, {strata_col},
         ('0x' || substr(md5(CAST({key_col} AS VARCHAR)), 1, 15))::BIGINT
           % {DENOM} AS bucket,
         ('0x' || substr(md5(CAST({key_col} AS VARCHAR)), 1, 15))::BIGINT AS h60
  FROM {source}
),
r AS (
  SELECT *,
         bucket < (CASE {strata_col} {rate_case} ELSE 0 END) AS kept,
         ROW_NUMBER() OVER (PARTITION BY {strata_col}
                            ORDER BY h60, {key_col}) AS rk
  FROM h
)
SELECT {key_col}, {strata_col}, bucket, kept,
       CASE WHEN rk <= (CASE {strata_col} {n_case} ELSE 0 END)
            THEN rk ELSE NULL END AS exact_rk
FROM r"""
