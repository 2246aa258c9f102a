"""Benchmark decontamination via n-gram overlap (E25).

Standard training-data hygiene (GPT-3 appx C / PaLM / Llama train-set
filtering): flag any corpus document sharing at least one word n-gram
with an evaluation-benchmark document, so contaminated pages can be
dropped before training.  Production pipelines use 13-grams; this
corpus's synthetic docs are short (median ~56 tokens), so the default
here is n=5 — the parameter is free.

Scale shape (the whole point of the operator):

- The benchmark side is *small by definition* (eval sets are MBs, the
  corpus is 100 TB).  Its distinct n-gram set is hashed to 8-byte
  ``xxhash64`` keys and **broadcast** — the corpus never shuffles.
- The corpus side computes per-doc **distinct** grams with array
  built-ins (dedup before explode, so the only aggregation downstream
  counts each matched gram once without a countDistinct exchange),
  explodes, hash-joins against the broadcast set, and re-aggregates by
  doc_id — an exchange of *matched rows only* (contamination is rare).
- Hash-join keys: a 64-bit collision could flag one extra gram
  (conservative in decontamination — never loses a true hit); at the
  test scale (~3e4 grams) collision probability is ~2^-35.

The DuckDB oracle joins on the gram *strings* (no xxhash64 for
variable-length input in SQL); agreement with the hashed Spark join is
itself the no-collision check at gate scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_N = 5


def _distinct_grams(text: Column | str, n: int) -> Column:
    """Distinct word n-grams of whitespace-tokenized text (space-joined);
    fewer than n tokens -> empty array."""
    c = F.col(text) if isinstance(text, str) else text
    t = F.filter(F.split(c, r"\s+"), lambda x: x != F.lit(""))
    grams = F.transform(
        F.sequence(F.lit(1), F.size(t) - (n - 1)),
        lambda i: F.array_join(F.slice(t, i, n), " "),
    )
    return F.when(F.size(t) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def contamination_flags(
    docs: DataFrame, benchmark: DataFrame, n: int = DEFAULT_N
) -> DataFrame:
    """docs(doc_id, text) x benchmark(text) ->
    (doc_id, n_grams, n_hits, contaminated) for every doc in ``docs``.

    n_grams = distinct n-grams in the doc; n_hits = how many of those
    occur anywhere in the benchmark; contaminated = n_hits > 0.
    """
    doc_grams = docs.select(
        "doc_id", _distinct_grams("text", n).alias("gs")
    )
    bench_set = (
        benchmark.select(F.explode(_distinct_grams("text", n)).alias("g"))
        .select(F.xxhash64("g").alias("gh"))
        .distinct()
    )
    exploded = doc_grams.select(
        "doc_id", F.explode("gs").alias("g")
    ).select("doc_id", F.xxhash64("g").alias("gh"))
    hits = (
        exploded.join(F.broadcast(bench_set), "gh")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        doc_grams.select("doc_id", F.size("gs").cast("long").alias("n_grams"))
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def contamination_flags_sql(bench_pred: str, n: int = DEFAULT_N) -> str:
    """DuckDB twin over the ``documents`` view: ``bench_pred`` is a SQL
    predicate on doc_id selecting the benchmark subset; corpus = the
    complement."""
    return f"""
WITH toks AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'), x -> len(x) > 0) AS t
  FROM documents
),
grams AS (
  SELECT doc_id,
         CASE WHEN len(t) >= {n}
              THEN list_distinct(list_transform(
                     range(1, len(t) - {n - 2}),
                     i -> array_to_string(t[i:i+{n - 1}], ' ')))
              ELSE []::VARCHAR[] END AS gs
  FROM toks
),
g AS (SELECT doc_id, unnest(gs) AS g FROM grams),
bench AS (SELECT DISTINCT g FROM g WHERE {bench_pred}),
hits AS (
  SELECT g.doc_id, count(*) AS n_hits
  FROM g JOIN bench USING (g)
  WHERE NOT ({bench_pred})
  GROUP BY g.doc_id
)
SELECT grams.doc_id,
       len(gs)::BIGINT AS n_grams,
       coalesce(n_hits, 0)::BIGINT AS n_hits,
       coalesce(n_hits, 0) > 0 AS contaminated
FROM grams LEFT JOIN hits ON grams.doc_id = hits.doc_id
WHERE NOT ({bench_pred.replace("doc_id", "grams.doc_id")})
"""
