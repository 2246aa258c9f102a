"""SpotSigs near-duplicate channel (E177): stopword-anchored spot
signatures (Theobald/Siddharth/Paepcke SIGIR'08 — "SpotSigs: robust
and efficient near duplicate detection in large web document
collections").

The webtext-native sibling of shingling: boilerplate (navigation,
ads, chrome) is short on stopwords while natural-language body text
is dense in them, so signatures anchored AT stopword occurrences
sample the article body and skip the chrome for free — the paper's
whole point, and the reason this channel complements the k-shingle
MinHash channel (which samples chrome and body alike) on crawl data.

Definitions (paper §3, defaults c=2, d=1):

- antecedents A = a fixed stopword set; tokenization is the engine's
  shared normalization (lowercase, strip non-alnum, whitespace split)
  with ALL token lengths kept (antecedents like "a"/"is" must
  survive — the one place the engine's min-token-length filter does
  not apply, documented at token extraction);
- at every occurrence of an antecedent, the spot signature is the
  antecedent plus the chain of the next ``c`` NON-antecedent tokens
  (spot distance d=1 over the antecedent-free token stream, paper
  §3.1); incomplete chains at document end are dropped;
- a document is the MULTISET of its spot signatures; similarity is
  multiset Jaccard  J(A,B) = Σ_s min(c_A(s), c_B(s)) / Σ_s max(...)
  with Σmax = tot_A + tot_B − Σmin (per-key min+max = sum identity).

Distributed shape (one groupBy shuffle + two hash joins, all JVM
below the extraction pass):

- one mapInPandas extraction pass → (doc, spot, cnt) — the same
  narrow-prefix shape as the signature stage;
- block purging: spots occurring in more than ``spot_df_cap`` docs
  are dropped WHOLE before pairing (the paper's inverted-index
  pruning, same lever as E173's block purge) — pair expansion is
  bounded by cap²/2 per spot, no boilerplate-spot explosion;
- candidate pairs: per-(lang, spot-hash) bucket collect + map-side
  numpy triangle expansion (the candidates.py bucket pattern), then
  pair dedup;
- the paper's LENGTH filter: multiset Jaccard ≤ min(tot)/max(tot),
  so pairs with tot-ratio < tau cannot reach the threshold and are
  pruned before the verify joins (recall-neutral for is_dup);
- verify is the SE4 compute-once shape: per-doc map<spot_hash,cnt>
  built once, two hash joins attach both maps to each pair, Σmin is
  a pure-JVM ``map_zip_with``+``aggregate`` fold.

Spot identity in the engine is xxhash64(spot) (8-byte shuffle keys at
10^12 docs); the DuckDB twin joins on the raw spot STRINGS, so value
equality of every Σmin doubles as a collision check (the E108
hash-vs-string twin pattern).

At 10^12 documents every stage is linear in (docs × spots/doc) except
the bucket expansion, which block purging bounds; the per-doc maps
are small (spots/doc ~ stopword count) and never wider than the
signature table the main channel already shuffles.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mediaduplicatefinder_spark.functions.sigcore import _NON_ALNUM_WS, _WS

# Paper §5 uses frequent stopwords as antecedents ({that, said, a,
# the, is} carried their best F1); fixed, documented, shared verbatim
# with the SQL twin.
ANTECEDENTS: tuple[str, ...] = (
    "the", "a", "an", "is", "was", "said", "that", "there",
    "it", "to", "of", "and", "in", "for", "on",
)
CHAIN_LEN = 2  # paper default c=2 (spot distance d=1)


def extract_spots(text: str, chain_len: int = CHAIN_LEN) -> list[str]:
    """Spot signatures of one document, in occurrence order with
    duplicates preserved (multiset semantics). Shared verbatim by the
    Spark extraction pass and the pytest reference."""
    cleaned = _NON_ALNUM_WS.sub("", (text or "").lower())
    toks = [t for t in _WS.split(cleaned) if t]
    ants = set(ANTECEDENTS)
    # rank[i] = number of non-antecedent tokens strictly before i
    nonant: list[str] = []
    spots: list[str] = []
    pending: list[tuple[str, int]] = []  # (antecedent, chain start rank)
    for tok in toks:
        if tok in ants:
            pending.append((tok, len(nonant)))
        else:
            nonant.append(tok)
    for ant, r0 in pending:
        if r0 + chain_len <= len(nonant):
            spots.append(":".join([ant, *nonant[r0 : r0 + chain_len]]))
    return spots


def _spot_counts(docs: DataFrame, chain_len: int) -> DataFrame:
    """(doc_id, lang, spot, cnt) — the multiset relation."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list = []
            langs: list = []
            spots: list = []
            cnts: list = []
            for did, lang, text in zip(
                pdf["doc_id"], pdf["lang"], pdf["text"]
            ):
                counts: dict[str, int] = {}
                for s in extract_spots(text or "", chain_len):
                    counts[s] = counts.get(s, 0) + 1
                for s, c in counts.items():
                    ids.append(did)
                    langs.append(lang)
                    spots.append(s)
                    cnts.append(c)
            yield pd.DataFrame(
                {"doc_id": ids, "lang": langs, "spot": spots, "cnt": cnts}
            )

    return docs.select("doc_id", "lang", "text").mapInPandas(
        fn, "doc_id long, lang string, spot string, cnt int"
    )


_PAIR_SCHEMA = T.StructType(
    [
        T.StructField("lang", T.StringType()),
        T.StructField("doc_a", T.LongType()),
        T.StructField("doc_b", T.LongType()),
    ]
)


def spotsig_pairs(
    docs: DataFrame,
    tau_num: int = 3,
    tau_den: int = 10,
    spot_df_cap: int = 256,
    chain_len: int = CHAIN_LEN,
) -> DataFrame:
    """docs(doc_id, lang, text) -> (lang, doc_a, doc_b, tot_a, tot_b,
    n_common, sim, is_dup): every same-lang pair sharing >= 1 kept
    spot whose spot-count ratio passes the paper's length filter
    (min/max >= tau), with exact multiset-Jaccard columns. The dup
    decision is the integer cross-multiplication
    ``Σmin * tau_den >= tau_num * (tot_a + tot_b − Σmin)`` — no float
    crosses engines."""
    import numpy as np

    # eager localCheckpoint: the spot relation feeds BOTH per-doc maps
    # and the bucket collect — without the cut the extraction UDF
    # evaluates three times (plan-audited; the SE4 compute-once rule).
    # Checkpoint, not persist: a bare persist() is never released and
    # pins executor storage for the session lifetime (review r5).
    spots = (
        _spot_counts(docs, chain_len)
        .withColumn("h", F.xxhash64("spot"))
        .localCheckpoint(eager=True)
    )

    # per-doc multiset map + total (computed ONCE — SE4)
    docmap = spots.groupBy("doc_id", "lang").agg(
        F.map_from_entries(
            F.collect_list(F.struct("h", "cnt"))
        ).alias("m"),
        F.sum("cnt").cast("long").alias("tot"),
    )

    # block purging: spot df <= cap (count of docs per (lang, spot))
    buckets = (
        spots.groupBy("lang", "h")
        .agg(F.collect_list("doc_id").alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= spot_df_cap))
    )

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_l: list = []
            out_a: list = []
            out_b: list = []
            for lang, ids in zip(pdf["lang"], pdf["ids"]):
                arr = np.sort(np.asarray(ids, dtype=np.int64))
                ia, ib = np.triu_indices(len(arr), 1)
                out_l.append(np.full(len(ia), lang, dtype=object))
                out_a.append(arr[ia])
                out_b.append(arr[ib])
            if out_a:
                yield pd.DataFrame(
                    {
                        "lang": np.concatenate(out_l),
                        "doc_a": np.concatenate(out_a),
                        "doc_b": np.concatenate(out_b),
                    }
                )

    pairs = (
        buckets.select("lang", "ids")
        .mapInPandas(expand, _PAIR_SCHEMA)
        .dropDuplicates(["lang", "doc_a", "doc_b"])
    )

    ma = docmap.select(
        F.col("doc_id").alias("doc_a"),
        "lang",
        F.col("m").alias("ma"),
        F.col("tot").alias("tot_a"),
    )
    mb = docmap.select(
        F.col("doc_id").alias("doc_b"),
        "lang",
        F.col("m").alias("mb"),
        F.col("tot").alias("tot_b"),
    )
    joined = (
        pairs.join(ma, ["lang", "doc_a"]).join(mb, ["lang", "doc_b"])
        # paper's length filter: J <= min(tot)/max(tot) < tau -> prune
        .filter(
            F.least("tot_a", "tot_b") * tau_den
            >= F.greatest("tot_a", "tot_b") * tau_num
        )
    )
    inter = F.map_zip_with(
        "ma",
        "mb",
        lambda _k, x, y: F.when(
            x.isNull() | y.isNull(), F.lit(0)
        ).otherwise(F.least(x, y)),
    )
    n_common = F.aggregate(
        F.map_values(inter), F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    out = joined.withColumn("n_common", n_common).select(
        "lang",
        "doc_a",
        "doc_b",
        "tot_a",
        "tot_b",
        "n_common",
        F.round(
            F.col("n_common")
            / (F.col("tot_a") + F.col("tot_b") - F.col("n_common")),
            9,
        ).alias("sim"),
        (
            F.col("n_common") * tau_den
            >= tau_num * (F.col("tot_a") + F.col("tot_b") - F.col("n_common"))
        ).alias("is_dup"),
    )
    return out


def spotsig_pairs_sql(
    docs_sql: str,
    tau_num: int = 3,
    tau_den: int = 10,
    spot_df_cap: int = 256,
    chain_len: int = CHAIN_LEN,
) -> str:
    """DuckDB twin over raw spot STRINGS (no hashing — value equality
    with the xxhash64-keyed engine is the collision check, the E108
    pattern). ``docs_sql`` selects (doc_id, lang, text)."""
    ants = ", ".join(f"'{a}'" for a in ANTECEDENTS)
    chain_cols = ", ".join(
        f"n{j}.w AS w{j}" for j in range(1, chain_len + 1)
    )
    chain_joins = "\n  ".join(
        f"JOIN nonant n{j} ON n{j}.doc_id = a.doc_id"
        f" AND n{j}.rn = a.r0 + {j}"
        for j in range(1, chain_len + 1)
    )
    spot_expr = " || ':' || ".join(
        ["w0"] + [f"w{j}" for j in range(1, chain_len + 1)]
    )
    return f"""
WITH src AS MATERIALIZED ({docs_sql}),
tok AS (
  SELECT doc_id, lang,
         list_filter(string_split_regex(
           lower(regexp_replace(text, '[^a-zA-Z0-9 \\t\\n\\r\\f\\x0B]', '', 'g')),
           '[ \\t\\n\\r\\f\\x0B]+'), w -> len(w) > 0) AS ws
  FROM src
),
pos AS (
  SELECT doc_id, lang, i, ws[i] AS w, ws[i] IN ({ants}) AS is_ant
  FROM tok, unnest(generate_series(1, len(ws))) AS u(i)
),
ranked AS (
  SELECT *, count(*) FILTER (WHERE NOT is_ant)
           OVER (PARTITION BY doc_id ORDER BY i
                 ROWS UNBOUNDED PRECEDING) AS r
  FROM pos
),
ants AS (SELECT doc_id, lang, i, w AS w0, r AS r0 FROM ranked WHERE is_ant),
nonant AS (SELECT doc_id, i, w, r AS rn FROM ranked WHERE NOT is_ant),
spots AS MATERIALIZED (
  SELECT a.doc_id, a.lang, {spot_expr} AS spot, count(*)::INT AS cnt
  FROM (SELECT a.doc_id, a.lang, a.w0, {chain_cols}
        FROM ants a
  {chain_joins}) a
  GROUP BY a.doc_id, a.lang, {spot_expr}
),
tot AS (SELECT doc_id, lang, sum(cnt)::BIGINT AS tot FROM spots
        GROUP BY doc_id, lang),
kept AS MATERIALIZED (
  SELECT s.doc_id, s.lang, s.spot FROM spots s
  JOIN (SELECT lang, spot FROM spots GROUP BY lang, spot
        HAVING count(*) BETWEEN 2 AND {spot_df_cap}) k
  USING (lang, spot)
),
cand AS (
  SELECT DISTINCT a.lang, a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM kept a JOIN kept b
    ON a.lang = b.lang AND a.spot = b.spot AND a.doc_id < b.doc_id
),
-- purging gates CANDIDATE GENERATION only (paper semantics): the
-- similarity itself is over the FULL multisets, like the engine's
-- per-doc maps
pairs AS (
  SELECT c.lang, c.doc_a, c.doc_b,
         sum(least(sa.cnt, sb.cnt))::BIGINT AS n_common
  FROM cand c
  JOIN spots sa ON sa.doc_id = c.doc_a AND sa.lang = c.lang
  JOIN spots sb ON sb.doc_id = c.doc_b AND sb.lang = c.lang
                AND sb.spot = sa.spot
  GROUP BY c.lang, c.doc_a, c.doc_b
)
SELECT p.lang, p.doc_a, p.doc_b, ta.tot AS tot_a, tb.tot AS tot_b,
       p.n_common,
       round(p.n_common / (ta.tot + tb.tot - p.n_common), 9) AS sim,
       p.n_common * {tau_den}
         >= {tau_num} * (ta.tot + tb.tot - p.n_common) AS is_dup
FROM pairs p
JOIN tot ta ON ta.doc_id = p.doc_a AND ta.lang = p.lang
JOIN tot tb ON tb.doc_id = p.doc_b AND tb.lang = p.lang
WHERE least(ta.tot, tb.tot) * {tau_den}
      >= greatest(ta.tot, tb.tot) * {tau_num}
"""
