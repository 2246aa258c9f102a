"""Token-distribution drift between corpus snapshots (E93).

Corpus monitoring 101: when a new crawl snapshot's token distribution
moves against the previous one, something changed — a spam wave, a
boilerplate template, an extraction regression — and the cheap alarm
is a per-group divergence between the two term histograms.  We use the
symmetric chi-square-family distance

    D = sum_t (p1(t) - p2(t))^2 / (p1(t) + p2(t))

over the union vocabulary (0 <= D <= 2; absent terms contribute the
other side's mass).  Unlike KL it is finite on disjoint support and
needs no smoothing constants.

Float-parity design: every per-term value is pure IEEE arithmetic
(divide, subtract, square, add, divide — no libm), so both engines
produce identical term values; the only order-sensitive step is the
SUM, which is a left fold in term order on both sides (Spark:
``aggregate(transform(array_sort(collect_list(struct(term, v)))))``;
DuckDB: ``list_reduce(list(v ORDER BY term))``) — bit-identical, no
rounding anywhere.  At 10^12 tokens a production run would use the
unordered tree-aggregated sum (the ~1e-15 rounding wobble is
statistically meaningless); the ordered fold is the cross-engine
parity formulation of the same number.

Shape: two (grp, term) count shuffles + one full-outer join on the
vocabulary — all cardinalities vocabulary-bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _term_counts(docs: DataFrame, text_col: str) -> DataFrame:
    return (
        docs.select(
            "grp",
            F.explode(
                F.filter(
                    F.split(F.lower(F.col(text_col)), "[^a-z0-9]+"),
                    lambda w: w != "",
                )
            ).alias("term"),
        )
        .groupBy("grp", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def token_drift(snap_a: DataFrame, snap_b: DataFrame) -> DataFrame:
    """snap_a/snap_b(grp, text) ->
    (grp, n_terms_a, n_terms_b, vocab_union, drift)."""
    ca = _term_counts(snap_a, "text").withColumnRenamed("c", "a")
    cb = _term_counts(snap_b, "text").withColumnRenamed("c", "b")
    na = ca.groupBy("grp").agg(F.sum("a").alias("na"))
    nb = cb.groupBy("grp").agg(F.sum("b").alias("nb"))
    j = (
        ca.join(cb, ["grp", "term"], "full_outer")
        .select(
            "grp",
            "term",
            F.coalesce("a", F.lit(0)).alias("a"),
            F.coalesce("b", F.lit(0)).alias("b"),
        )
        .join(na, "grp")
        .join(nb, "grp")
    )
    pa = F.col("a") / F.col("na")
    pb = F.col("b") / F.col("nb")
    v = (pa - pb) * (pa - pb) / (pa + pb)
    terms = j.select("grp", "term", v.alias("v"))
    agg = terms.groupBy("grp").agg(
        F.count(F.lit(1)).alias("vocab_union"),
        F.expr(
            "aggregate(transform(array_sort(collect_list(struct(term, v))),"
            " x -> x.v), cast(0.0 as double), (acc, x) -> acc + x)"
        ).alias("drift"),
    )
    return (
        na.join(nb, "grp")
        .join(agg, "grp")
        .select(
            "grp",
            F.col("na").alias("n_terms_a"),
            F.col("nb").alias("n_terms_b"),
            "vocab_union",
            "drift",
        )
    )


def token_drift_sql(snap_a_sql: str, snap_b_sql: str) -> str:
    """DuckDB twin; each snap SQL SELECTs (grp, text)."""

    def counts(src: str, col: str) -> str:
        return f"""
  SELECT grp, term, count(*)::BIGINT AS {col}
  FROM (
    SELECT grp,
           unnest(list_filter(
             string_split_regex(lower(text), '[^a-z0-9]+'),
             p -> p <> '')) AS term
    FROM ({src})
  ) GROUP BY grp, term"""

    return f"""
WITH ca AS ({counts(snap_a_sql, "a")}),
cb AS ({counts(snap_b_sql, "b")}),
na AS (SELECT grp, sum(a)::BIGINT AS na FROM ca GROUP BY grp),
nb AS (SELECT grp, sum(b)::BIGINT AS nb FROM cb GROUP BY grp),
j AS (
  SELECT coalesce(ca.grp, cb.grp) AS grp,
         coalesce(ca.term, cb.term) AS term,
         coalesce(ca.a, 0) AS a, coalesce(cb.b, 0) AS b
  FROM ca FULL OUTER JOIN cb
    ON ca.grp = cb.grp AND ca.term = cb.term
),
terms AS (
  SELECT j.grp, j.term,
         ((j.a / na.na - j.b / nb.nb) * (j.a / na.na - j.b / nb.nb))
           / (j.a / na.na + j.b / nb.nb) AS v
  FROM j JOIN na ON j.grp = na.grp JOIN nb ON j.grp = nb.grp
),
agg AS (
  SELECT grp, count(*)::BIGINT AS vocab_union,
         list_reduce(list_prepend(0.0, list(v ORDER BY term)),
                     (acc, x) -> acc + x) AS drift
  FROM terms GROUP BY grp
)
SELECT na.grp, na.na AS n_terms_a, nb.nb AS n_terms_b,
       a.vocab_union, a.drift
FROM na JOIN nb ON na.grp = nb.grp JOIN agg a ON a.grp = na.grp
"""
