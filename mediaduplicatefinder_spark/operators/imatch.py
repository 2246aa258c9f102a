"""I-Match collection-statistics fingerprint dedup (E178): Chowdhury/
Frieder/Grossman/McCabe, "Collection Statistics for Fast Duplicate
Document Detection" (ACM TOIS 20(2), 2002), plus the lexicon-
randomization recall extension of Kolcz/Chowdhury/Alspector (KDD'05).

The third point on the exact↔fuzzy dedup spectrum the engine covers:
exact SHA dedup (E1) is brittle to ANY edit; MinHash/SimHash (E2/E3)
pay a candidate-pair join; I-Match is a SINGLE-PASS groupBy — each
document is fingerprinted by the hash of its sorted set of terms that
survive a COLLECTION-STATISTICS filter, so documents differing only
in filtered terms (ubiquitous boilerplate words, hapax noise) collide
on one fingerprint and group with zero pair computation. The paper's
insight: mid/high-IDF terms carry document identity; very common and
very rare terms carry noise.

Filter semantics (exact integer form — no float log crosses engines):
keep term t iff  df(t) >= df_min  (drops hapax noise, paper's
idf-ceiling) AND  df(t) * max_df_den <= N * max_df_num  (drops terms
in more than max_df_num/max_df_den of the collection — the idf-floor).
N = collection size, df over DISTINCT docs. Docs with zero surviving
terms are excluded (paper: unfingerprintable).

Lexicon randomization (KDD'05): K extra fingerprints per doc, each
over the lexicon with one deterministic 1/K term slice REMOVED
(bucket j-1 dropped for variant j) — a single-term edit perturbs the
full-lexicon fingerprint but leaves the >= K-1 variants whose dropped
slice contains the edited term's bucket unaffected, so near-identical
docs still collide on some variant (the paper's recall fix). The term
bucket must be cross-engine-exact, so it is the code-unit sum mod K —
a weak partition by design; production swaps in xxhash64 and the twin
pins the MECHANISM (slice-drop union + per-variant grouping), which is
hash-choice-independent.

Distributed shape: one token explode + one broadcast-joined lexicon
filter + one groupBy-doc sort-agg + one groupBy-fingerprint — all
JVM expressions (sha2 over concat_ws of array_sort), no Python in
the path, no pair join anywhere. At 10^12 docs the lexicon aggregate
is a map-side-combining count distinct and the fingerprint groupBy
is the same shuffle the exact-dedup stage already pays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _ascii_sum(col):
    """Cross-engine-exact term bucket: sum of code units. Weak by
    design (documented above); production uses xxhash64."""
    return F.aggregate(
        F.transform(F.split(col, ""), lambda ch: F.coalesce(F.ascii(ch), F.lit(0))),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def imatch_groups(
    docs: DataFrame,
    df_min: int = 2,
    max_df_num: int = 1,
    max_df_den: int = 2,
    n_variants: int = 0,
    min_token_len: int = 3,
) -> DataFrame:
    """docs(doc_id, lang, text) -> (doc_id, lang, variant, fingerprint,
    n_terms, group_size) for docs whose fingerprint (variant 0 = full
    filtered lexicon; 1..K = randomized-lexicon variants) is shared by
    >= 2 docs. Same-lang grouping (the engine's F1 gate)."""
    from mediaduplicatefinder_spark.functions.text import tokens_expr

    toks = docs.select(
        "doc_id",
        "lang",
        F.explode(tokens_expr(F.col("text"), min_token_len)).alias("term"),
    ).distinct()

    n_docs = toks.select("doc_id").distinct().count()
    lex = (
        toks.groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(
            (F.col("df") >= df_min)
            & (F.col("df") * max_df_den <= n_docs * max_df_num)
        )
        .select("term")
    )

    kept = toks.join(F.broadcast(lex), "term")

    rows = kept.withColumn(
        "bucket",
        _ascii_sum(F.col("term")) % n_variants if n_variants else F.lit(0),
    )
    frames = []
    base = rows.withColumn("variant", F.lit(0))
    frames.append(base)
    for j in range(1, n_variants + 1):
        frames.append(
            rows.filter(F.col("bucket") != (j - 1)).withColumn(
                "variant", F.lit(j)
            )
        )
    all_rows = frames[0]
    for fr in frames[1:]:
        all_rows = all_rows.unionByName(fr)

    fps = (
        all_rows.groupBy("doc_id", "lang", "variant")
        .agg(
            F.sha2(
                F.concat_ws("\x1f", F.array_sort(F.collect_set("term"))), 256
            ).alias("fingerprint"),
            F.count("*").alias("n_terms"),
        )
    )
    sizes = fps.groupBy("lang", "variant", "fingerprint").agg(
        F.count("*").alias("group_size")
    )
    return (
        fps.join(sizes, ["lang", "variant", "fingerprint"])
        .filter(F.col("group_size") >= 2)
        .select(
            "doc_id", "lang", "variant", "fingerprint", "n_terms", "group_size"
        )
    )


def imatch_groups_sql(
    docs_sql: str,
    df_min: int = 2,
    max_df_num: int = 1,
    max_df_den: int = 2,
    n_variants: int = 0,
    min_token_len: int = 3,
) -> str:
    """DuckDB twin (sha256 over the same 0x1f-joined sorted term set;
    DuckDB's sha256() == Spark's sha2(,256) on identical input bytes)."""
    variant_union = "SELECT 0 AS variant, NULL::BIGINT AS dropped"
    if n_variants:
        variant_union += "".join(
            f"\n  UNION ALL SELECT {j} AS variant, {j - 1}::BIGINT AS dropped"
            for j in range(1, n_variants + 1)
        )
    bucket = (
        f"list_sum(list_transform(string_split(term, ''),"
        f" ch -> coalesce(unicode(ch), 0)))"
        f" % {n_variants}" if n_variants else "0"
    )
    return f"""
WITH src AS MATERIALIZED ({docs_sql}),
toks AS MATERIALIZED (
  SELECT DISTINCT doc_id, lang, token AS term
  FROM (
    SELECT doc_id, lang,
           lower(regexp_replace(text, '[^a-zA-Z0-9 \\t\\n\\r\\f\\x0B]', '', 'g'))
             AS cleaned
    FROM src
  ), unnest(list_distinct(list_filter(
       string_split_regex(cleaned, '[ \\t\\n\\r\\f\\x0B]+'),
       x -> len(x) >= {min_token_len}))) AS u(token)
),
n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM toks),
lex AS (
  SELECT term FROM toks GROUP BY term
  HAVING count(DISTINCT doc_id) >= {df_min}
     AND count(DISTINCT doc_id) * {max_df_den}
         <= (SELECT n_docs FROM n) * {max_df_num}
),
kept AS MATERIALIZED (
  SELECT t.doc_id, t.lang, t.term, ({bucket})::BIGINT AS bucket
  FROM toks t JOIN lex USING (term)
),
vars AS ({variant_union}),
fps AS (
  SELECT k.doc_id, k.lang, v.variant,
         sha256(string_agg(k.term, chr(31) ORDER BY k.term))
           AS fingerprint,
         count(*)::BIGINT AS n_terms
  FROM kept k JOIN vars v
    ON v.dropped IS NULL OR k.bucket <> v.dropped
  GROUP BY k.doc_id, k.lang, v.variant
)
SELECT f.doc_id, f.lang, f.variant, f.fingerprint, f.n_terms,
       s.group_size
FROM fps f
JOIN (SELECT lang, variant, fingerprint, count(*)::BIGINT AS group_size
      FROM fps GROUP BY lang, variant, fingerprint
      HAVING count(*) >= 2) s
USING (lang, variant, fingerprint)
"""
