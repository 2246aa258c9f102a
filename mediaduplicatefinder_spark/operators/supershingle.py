"""Broder super-shingles (E132): the two-level sketch AltaVista used
to cluster the 1997 web — the ancestor of every MinHash-LSH band trick
this repo ships, and still the cheapest "are these syntactically the
same page" candidate channel at crawl scale.

Published algorithm (Broder, "On the resemblance and containment of
documents", 1997; Broder/Glassman/Manasse/Zweig, "Syntactic clustering
of the Web", WWW 1997):

1. k-word shingles per document, hashed to 64-bit values;
2. the SKETCH is the ``s`` smallest distinct hash values;
3. sort the sketch and concatenate NON-OVERLAPPING groups of ``g``
   consecutive values; hash each group — these are the SUPER-shingles
   (only full groups count);
4. two documents sharing >= ``r`` super-shingles (r=2 in the paper's
   clustering run) are near-duplicate candidates — an exact-key join,
   no similarity computation at pair time at all.

Why it scales where pair-wise sketching can't: a super-shingle match
requires ``g`` consecutive min-hashes to agree, so buckets hold only
near-identical documents — the candidate join is an equi-join on a key
whose selectivity RISES with corpus size (boilerplate families are the
exception; ``bucket_cap`` bounds them like the LSH channel's capped
bands, candidates.py).

Hash: the repo's cross-engine 60-bit hash (``conv(substr(md5(x),1,15),
16,10)`` == DuckDB ``('0x'||substr(md5(x),1,15))::BIGINT`` — the
hamming_pairs idiom), so the oracle reproduces every sketch value
bit-for-bit. Production would swap in ``xxhash64``; the channel's
shape is hash-agnostic.

Everything is native DataFrame expressions — no Python below the
driver, one exchange on the super-shingle key, one on the pair key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _h60(col: Column) -> Column:
    """Cross-engine 60-bit hash (always positive)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def supershingle_keys(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_cols: list[str] | None = None,
    k: int = 3,
    s: int = 24,
    g: int = 4,
) -> DataFrame:
    """(id, group_cols..., ss:long) — one row per (doc, super-shingle).

    Docs with fewer than ``k`` tokens, or whose sketch holds fewer than
    ``g`` values, emit no rows (no full group exists — Broder's "too
    short to sketch" case)."""
    from pyspark.sql import Window

    group_cols = group_cols or []
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    # Flat, codegen-friendly shape: explode shingle positions, hash as
    # a top-level column, rank per doc, group-agg the super-shingles.
    # (A nested-transform formulation computes the same thing but falls
    # out of whole-stage codegen and re-evaluates the sketch subtree
    # per group — measured 59 s vs ~2 s at sf0.01.)  Per-doc windows /
    # aggs all cluster on the id column, so the explode is followed by
    # ONE exchange; doc length caps bound the skew.
    shingled = (
        df.filter(F.size(toks) >= k)
        .select(id_col, *group_cols, toks.alias("__w"))
        .select(
            id_col,
            *group_cols,
            F.explode(
                F.sequence(F.lit(1), F.size("__w") - (k - 1))
            ).alias("__i"),
            F.col("__w"),
        )
        .select(
            id_col,
            *group_cols,
            _h60(
                F.concat_ws(
                    " ",
                    *[F.element_at("__w", F.col("__i") + j) for j in range(k)],
                )
            ).alias("__hv"),
        )
    )
    # dense_rank over distinct-by-construction + a first-row marker
    # dedupes AND ranks under the SAME doc-keyed exchange (a
    # dropDuplicates would add a second exchange on (id, hv))
    drk = F.dense_rank().over(Window.partitionBy(id_col).orderBy("__hv"))
    first = F.row_number().over(
        Window.partitionBy(id_col, "__hv").orderBy(F.lit(1))
    )
    sketch = (
        shingled.withColumn("__rk", drk)
        .withColumn("__f", first)
        .filter((F.col("__f") == 1) & (F.col("__rk") <= s))
        .drop("__f")
    )
    grp = (
        sketch.withColumn(
            "__gi", F.floor((F.col("__rk") - 1) / g).cast("int")
        )
        .groupBy(id_col, *group_cols, "__gi")
        .agg(
            F.concat_ws(
                "-", F.transform(F.array_sort(F.collect_list("__hv")),
                                 lambda x: x.cast("string"))
            ).alias("__gs"),
            F.count("*").alias("__n"),
        )
        .filter(F.col("__n") == g)
    )
    return grp.select(
        id_col, *group_cols, _h60(F.col("__gs")).alias("ss")
    ).dropDuplicates([id_col, "ss"])


def supershingle_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_cols: list[str] | None = None,
    k: int = 3,
    s: int = 24,
    g: int = 4,
    r: int = 2,
    bucket_cap: int | None = None,
) -> DataFrame:
    """Candidate pairs (id_a, id_b, n_shared) with n_shared >= r.

    ``bucket_cap``: keep only the ``cap`` lowest ids per super-shingle
    bucket (deterministic, the capped-band pattern) — boilerplate
    families cannot explode the join; None = uncapped."""
    group_cols = group_cols or []
    keys = supershingle_keys(df, id_col, text_col, group_cols, k, s, g)
    if bucket_cap is not None:
        from pyspark.sql import Window

        w = (
            Window.partitionBy("ss", *group_cols)
            .orderBy(F.col(id_col))
        )
        keys = (
            keys.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= bucket_cap)
            .drop("__rn")
        )
    a, b = keys.alias("a"), keys.alias("b")
    on = [F.col(f"a.{c}") == F.col(f"b.{c}") for c in group_cols]
    on.append(F.col("a.ss") == F.col("b.ss"))
    on.append(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    pairs = a.join(b, on).select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"b.{id_col}").alias("id_b"),
    )
    return (
        pairs.groupBy("id_a", "id_b")
        .agg(F.count("*").cast("long").alias("n_shared"))
        .filter(F.col("n_shared") >= r)
    )


def supershingle_pairs_sql(
    source: str = "SELECT doc_id, lang, text FROM documents",
    id_col: str = "doc_id",
    group_col: str = "lang",
    k: int = 3,
    s: int = 24,
    g: int = 4,
    r: int = 2,
) -> str:
    """DuckDB twin of :func:`supershingle_pairs` (uncapped), value-exact
    through every sketch hash."""
    h = "('0x' || substr(md5({x}), 1, 15))::BIGINT"
    return f"""
WITH src AS ({source}),
toks AS (
  SELECT {id_col}, {group_col},
         list_filter(string_split_regex(trim(text), '\\s+'),
                     x -> x <> '') AS w
  FROM src
),
pos AS (
  SELECT {id_col}, {group_col}, w,
         unnest(range(1, len(w) - {k} + 2)) AS i
  FROM toks WHERE len(w) >= {k}
),
sh AS (  -- distinct k-shingles, hashed
  SELECT DISTINCT {id_col}, {group_col},
         {h.format(x=f"array_to_string(list_slice(w, i, i + {k - 1}), ' ')")} AS hv
  FROM pos
),
sketch AS (  -- rank of each distinct hash; keep the s smallest
  SELECT {id_col}, {group_col}, hv,
         row_number() OVER (PARTITION BY {id_col} ORDER BY hv) AS rk
  FROM sh QUALIFY rk <= {s}
),
grp AS (  -- non-overlapping groups of g consecutive sketch values
  SELECT {id_col}, {group_col}, (rk - 1) // {g} AS gi,
         string_agg(hv::VARCHAR, '-' ORDER BY hv) AS gs,
         count(*) AS n
  FROM sketch GROUP BY {id_col}, {group_col}, (rk - 1) // {g}
),
ss AS (
  SELECT DISTINCT {id_col}, {group_col}, {h.format(x='gs')} AS ss
  FROM grp WHERE n = {g}
)
SELECT a.{id_col} AS id_a, b.{id_col} AS id_b,
       count(*)::BIGINT AS n_shared
FROM ss a JOIN ss b
  ON a.{group_col} = b.{group_col} AND a.ss = b.ss
 AND a.{id_col} < b.{id_col}
GROUP BY a.{id_col}, b.{id_col}
HAVING count(*) >= {r}
"""
