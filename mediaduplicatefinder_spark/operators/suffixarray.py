"""Bounded suffix array + adjacent-LCP exact-substring dedup (E35).

The north-star names "an optional suffix-array substring stage for
exact long-match dedup"; winnowing (E15) and the LCS verifier (E16)
approximate it pairwise.  This operator builds the real corpus-level
primitive of Lee et al. 2022 ("Deduplicating Training Data Makes
Language Models Better", arXiv:2107.06499): a suffix array over the
token stream, whose ADJACENT-suffix longest-common-prefix array finds
every duplicated token span >= MIN_MATCH corpus-wide — without ever
enumerating document pairs.

Bounded-depth design: suffixes are ordered by their first ``CAP``
tokens, ties by (doc_id, pos).  Dedup only needs match lengths up to
the published threshold (~50 BPE tokens in the paper; MIN_MATCH here),
so CAP bounds both the prefix-doubling rounds (log2 CAP) and the LCP
walk — the full unbounded SA costs log2(corpus) rounds for resolution
no dedup decision ever reads.

Distributed shape (manber-myers prefix doubling, DataFrame-native):

1. rank_1 = dense rank of each token (ordered by md5(token) — any
   consistent total order on the alphabet yields the same equal-prefix
   grouping, and md5 hex order is engine-portable; dsir.py precedent).
2. for k in 1,2,4,...: rank_{2k} = dense rank of
   (rank_k[p], rank_k[p+k]) — the p+k lookup is a self-join on
   (doc_id, pos+k); missing positions rank 0 (end-of-doc sorts first).
3. every dense rank is computed DISTRIBUTED: distinct keys ->
   repartitionByRange -> per-partition row_number + driver-side
   offsets of the tiny per-partition counts (the same two-phase
   decomposition as selection.budget_selection; NO single-reducer
   global window anywhere).
4. sa_rank = the same machinery over the unique key
   (rank_CAP, doc_id, pos) — the bounded suffix array.
5. lcp with the SA-predecessor: binary rank walk m = CAP, CAP/2, ...:
   if rank_m[a+l] == rank_m[b+l] then l += m — 2 hash-join lookups
   per level on compact (doc,pos,rank) rows; never the token arrays
   (the full-text-pair-join anti-pattern this repo bans).

Suffixes that end before CAP: missing ranks coalesce to 0 on BOTH
sides, so two suffixes that are byte-equal to their (equal) ends
compare equal through every level and the walk overshoots — the final
``match_len = least(l, len_a - pos_a, len_b - pos_b)`` clips it to the
real common token count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

CAP = 32  # bounded comparison depth (tokens); >= MIN_MATCH
MIN_MATCH = 15  # duplicated-span report threshold (tokens)


def _levels(cap: int) -> list[int]:
    out, k = [], 1
    while k < cap:
        out.append(k)
        k *= 2
    return out  # 1, 2, ..., cap/2  (rank after step k covers 2k tokens)


def _dense_rank_with_handle(
    df: DataFrame, key: Column, out_col: str
) -> tuple[DataFrame, DataFrame]:
    """``distributed_dense_rank`` core; also returns the persisted
    distinct-key table so round-driving callers can ``unpersist`` it
    once the result is materialized (at corpus scale each round's rank
    table is O(n positions) — holding every round's cache would pin
    log2(CAP) full-size tables in executor memory)."""
    spark = df.sparkSession
    keyed = df.withColumn("__k", key)
    p = spark.sparkContext.defaultParallelism
    d = (
        keyed.select("__k")
        .distinct()
        .repartitionByRange(p, "__k")
        .withColumn("__pid", F.spark_partition_id())
    )
    local = Window.partitionBy("__pid").orderBy("__k")
    # persist: the per-partition-count collect and the rank join both
    # consume this table; without it the whole upstream lineage would
    # evaluate twice per round
    d = d.withColumn("__lr", F.row_number().over(local)).persist()
    sizes = sorted(
        (r["__pid"], r["c"])
        for r in d.groupBy("__pid").agg(F.count("*").alias("c")).collect()
    )
    offsets, acc = [], 0
    for pid, c in sizes:
        offsets.append((pid, acc))
        acc += c
    off = spark.createDataFrame(offsets, "__pid int, __off long")
    ranks = (
        d.join(F.broadcast(off), "__pid")
        .select("__k", (F.col("__lr") + F.col("__off")).alias(out_col))
    )
    return keyed.join(ranks, "__k").drop("__k"), d


def distributed_dense_rank(
    df: DataFrame, key: Column, out_col: str
) -> DataFrame:
    """Adds ``out_col`` = 1-based dense rank of ``key`` WITHOUT a
    single-reducer global window: distinct keys are range-partitioned
    (equal keys co-located by construction), ranked per partition, and
    shifted by driver-side offsets of the per-partition distinct
    counts."""
    return _dense_rank_with_handle(df, key, out_col)[0]


def token_positions(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, pos, tok, doc_len): 0-based positions of the lowercased
    whitespace tokens (the dsir.py token convention)."""
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda t: t != F.lit(""),
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"), toks.alias("ts"))
        .select("doc_id", F.size("ts").alias("doc_len"), F.posexplode("ts"))
        .select("doc_id", "doc_len", F.col("pos"), F.col("col").alias("tok"))
    )


def suffix_ranks(docs: DataFrame, cap: int = CAP) -> DataFrame:
    """(doc_id, pos, doc_len, r1, r2, ..., r{cap}, sa_rank): the
    per-level prefix ranks and the bounded suffix array."""
    t = token_positions(docs)
    t, d = _dense_rank_with_handle(t, F.md5("tok"), "r1")
    t = t.drop("tok")
    pending = [d]  # rank caches freed once a later eager checkpoint
    # has materialized everything that reads them
    r_prev = "r1"
    for k in _levels(cap):
        nxt = t.select(
            "doc_id",
            (F.col("pos") - k).alias("pos"),
            F.col(r_prev).alias("__rn"),
        )
        r_next = f"r{2 * k}"
        t = (
            t.join(nxt, ["doc_id", "pos"], "left")
            .withColumn("__rn", F.coalesce("__rn", F.lit(0)))
        )
        # truncate lineage per doubling round: each round's driver-side
        # offset collect would otherwise re-evaluate every prior round
        # (at cluster scale this checkpoint is the stage-ledger write
        # a real prefix-doubling job does between rounds)
        t, d = _dense_rank_with_handle(
            t, F.struct(F.col(r_prev), F.col("__rn")), r_next
        )
        t = t.drop("__rn").localCheckpoint(eager=True)
        pending.append(d)
        for h in pending:
            h.unpersist()
        pending = []
        r_prev = r_next
    t, d = _dense_rank_with_handle(
        t,
        F.struct(F.col(f"r{cap}"), F.col("doc_id"), F.col("pos")),
        "sa_rank",
    )
    # eager checkpoint: downstream (adjacent_lcp) scans this table once
    # per walk level and twice per join side — materialized blocks serve
    # all of them, and the final round's rank cache can be released like
    # the loop rounds'
    t = t.localCheckpoint(eager=True)
    d.unpersist()
    return t


def adjacent_lcp(t: DataFrame, cap: int = CAP) -> DataFrame:
    """The full adjacent-LCP relation over a ``suffix_ranks`` table:
    (doc_id, pos, sa_rank, prev_doc, prev_pos, match_len) for EVERY
    sa_rank >= 2, match_len unfiltered."""
    cur = t.select("doc_id", "pos", "doc_len", "sa_rank")
    prev = cur.select(
        (F.col("sa_rank") + 1).alias("sa_rank"),
        F.col("doc_id").alias("prev_doc"),
        F.col("pos").alias("prev_pos"),
        F.col("doc_len").alias("prev_len"),
    )
    pairs = cur.join(prev, "sa_rank").select(
        "doc_id", "pos", "doc_len", "sa_rank",
        "prev_doc", "prev_pos", "prev_len",
        F.lit(0).alias("l"),
    )
    # binary LCP walk over the rank tables, top level first
    for m in [cap] + list(reversed([2 * k for k in _levels(cap)[:-1]])) + [1]:
        side_a = t.select(
            F.col("doc_id").alias("doc_id"),
            F.col("pos").alias("__pa"),
            F.col(f"r{m}").alias("__ra"),
        )
        side_b = t.select(
            F.col("doc_id").alias("prev_doc"),
            F.col("pos").alias("__pb"),
            F.col(f"r{m}").alias("__rb"),
        )
        pairs = (
            pairs.join(
                side_a,
                (pairs["doc_id"] == side_a["doc_id"])
                & (side_a["__pa"] == pairs["pos"] + pairs["l"]),
                "left",
            )
            .drop(side_a["doc_id"])
            .join(
                side_b,
                (pairs["prev_doc"] == side_b["prev_doc"])
                & (side_b["__pb"] == pairs["prev_pos"] + pairs["l"]),
                "left",
            )
            .drop(side_b["prev_doc"])
            .withColumn(
                # both-missing ranks compare equal (0 == 0): that only
                # happens when both suffixes already ended, and the
                # final least() clips the overshoot to the real length
                "l",
                F.when(
                    (F.col("l") + m <= cap)
                    & (
                        F.coalesce("__ra", F.lit(0))
                        == F.coalesce("__rb", F.lit(0))
                    ),
                    F.col("l") + m,
                ).otherwise(F.col("l")),
            )
            .drop("__pa", "__ra", "__pb", "__rb")
        )
    return pairs.select(
        "doc_id", "pos", "sa_rank", "prev_doc", "prev_pos",
        F.least(
            F.col("l"),
            F.col("doc_len") - F.col("pos"),
            F.col("prev_len") - F.col("prev_pos"),
        ).alias("match_len"),
    )


def suffix_dup_spans(
    docs: DataFrame, min_match: int = MIN_MATCH, cap: int = CAP
) -> DataFrame:
    """(doc_id, pos, sa_rank, prev_doc, prev_pos, match_len): every
    suffix sharing >= min_match leading tokens with its SA predecessor
    — i.e. every duplicated-span occurrence except the first in SA
    order (Lee et al.'s dup relation, bounded at cap)."""
    t = suffix_ranks(docs, cap)  # checkpointed — blocks serve all scans
    return adjacent_lcp(t, cap).filter(F.col("match_len") >= min_match)


def exactsubstr_dedup(
    docs: DataFrame, min_match: int = MIN_MATCH, cap: int = CAP
) -> DataFrame:
    """ExactSubstr removal (Lee et al. 2022 §4.2): cut every
    NON-FIRST occurrence (in SA order) of a duplicated >= min_match
    token span and reassemble the documents.

    -> (doc_id, n_tokens, n_dropped, text_deduped): token positions
    covered by a flagged span are dropped; the survivors are rejoined
    with single spaces in position order.  Shapes: the coverage
    explode is O(sum of span lengths), the rebuild is one
    groupBy(doc_id) over kept tokens (map-side combining collect), and
    nothing ever pairs documents.
    """
    t = suffix_ranks(docs, cap)  # checkpointed — blocks serve all scans
    flagged = adjacent_lcp(t, cap).filter(F.col("match_len") >= min_match)
    cover = flagged.select(
        "doc_id",
        F.explode(
            F.sequence(F.col("pos"), F.col("pos") + F.col("match_len") - 1)
        ).alias("pos"),
    ).distinct()
    toks = token_positions(docs)
    kept = toks.join(cover, ["doc_id", "pos"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda s: s["tok"],
            ),
        ).alias("text_deduped"),
    )
    base = docs.select("doc_id").join(
        toks.groupBy("doc_id").agg(F.count("*").alias("n_tokens")),
        "doc_id",
        "left",
    )
    return (
        base.join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            (
                F.coalesce("n_tokens", F.lit(0))
                - F.coalesce("n_kept", F.lit(0))
            ).alias("n_dropped"),
            F.coalesce("text_deduped", F.lit("")).alias("text_deduped"),
        )
    )


def _sa_lcp_ctes(cap: int) -> str:
    """Shared WITH-body: docs0 -> positions -> prefix-doubling rank
    layers -> bounded SA -> naive adjacent LCP (``lcp`` CTE)."""
    sql = f"""
WITH docs0 AS MATERIALIZED (
  SELECT doc_id,
         list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                     t -> t <> '') AS ts
  FROM documents
),
posn AS (
  SELECT doc_id, len(ts) AS doc_len,
         unnest(range(len(ts)))::BIGINT AS pos
  FROM docs0
),
lvl1 AS (
  SELECT p.doc_id, p.doc_len, p.pos,
         dense_rank() OVER (ORDER BY md5(d.ts[p.pos + 1])) AS r1
  FROM posn p JOIN docs0 d ON d.doc_id = p.doc_id
)"""
    prev, prev_r = "lvl1", 1
    k = 1
    while k < cap:
        nxt = 2 * k
        sql += f""",
lvl{nxt} AS (
  SELECT * EXCLUDE (__rn),
         dense_rank() OVER (ORDER BY r{k}, __rn) AS r{nxt}
  FROM (
    SELECT *, coalesce(lead(r{k}, {k}) OVER (PARTITION BY doc_id
                                             ORDER BY pos), 0) AS __rn
    FROM {prev})
)"""
        prev, prev_r, k = f"lvl{nxt}", nxt, nxt
    sql += f""",
sa AS MATERIALIZED (
  SELECT doc_id, doc_len, pos,
         row_number() OVER w AS sa_rank,
         lag(doc_id) OVER w AS prev_doc,
         lag(pos) OVER w AS prev_pos,
         lag(doc_len) OVER w AS prev_len
  FROM {prev}
  WINDOW w AS (ORDER BY r{cap}, doc_id, pos)
),
lcp AS (
  SELECT s.doc_id, s.pos, s.sa_rank, s.prev_doc, s.prev_pos,
         least(
           coalesce((SELECT min(j) FROM range({cap}) t(j)
                     WHERE s.pos + j >= s.doc_len
                        OR s.prev_pos + j >= s.prev_len
                        OR a.ts[s.pos + j + 1] <> b.ts[s.prev_pos + j + 1]),
                    {cap}),
           s.doc_len - s.pos, s.prev_len - s.prev_pos) AS match_len
  FROM sa s
  JOIN docs0 a ON a.doc_id = s.doc_id
  JOIN docs0 b ON b.doc_id = s.prev_doc
)"""
    return sql


def suffix_dup_spans_sql(
    min_match: int = MIN_MATCH, cap: int = CAP
) -> str:
    """DuckDB twin: same md5-ordered alphabet and prefix-doubling rank
    layers (lead(r, k) per doc + global dense_rank — the naive
    single-window formulation of each distributed round), but a NAIVE
    token-by-token LCP on the adjacent pairs.  Agreement proves the
    distributed dense-rank decomposition, the bounded SA order, AND
    the binary rank-walk LCP against direct token comparison."""
    return f"""{_sa_lcp_ctes(cap)}
SELECT doc_id, pos, sa_rank, prev_doc, prev_pos, match_len
FROM lcp WHERE match_len >= {min_match}
"""


def exactsubstr_dedup_sql(
    min_match: int = MIN_MATCH, cap: int = CAP
) -> str:
    """DuckDB twin of the ExactSubstr removal: flagged-span coverage
    explode + position anti-join + ordered string_agg rebuild."""
    return f"""{_sa_lcp_ctes(cap)},
flagged AS (SELECT doc_id, pos, match_len FROM lcp
            WHERE match_len >= {min_match}),
cover AS (
  SELECT DISTINCT doc_id,
         pos + unnest(range(match_len))::BIGINT AS pos
  FROM flagged
),
kept AS (
  SELECT p.doc_id, p.pos, d.ts[p.pos + 1] AS tok
  FROM posn p JOIN docs0 d ON d.doc_id = p.doc_id
  WHERE NOT EXISTS (SELECT 1 FROM cover c
                    WHERE c.doc_id = p.doc_id AND c.pos = p.pos)
),
rebuilt AS (
  SELECT doc_id, count(*) AS n_kept,
         string_agg(tok, ' ' ORDER BY pos) AS text_deduped
  FROM kept GROUP BY doc_id
),
ntok AS (SELECT doc_id, count(*) AS n_tokens FROM posn GROUP BY doc_id)
SELECT d.doc_id,
       coalesce(n.n_tokens, 0)::BIGINT AS n_tokens,
       (coalesce(n.n_tokens, 0) - coalesce(r.n_kept, 0))::BIGINT
         AS n_dropped,
       coalesce(r.text_deduped, '') AS text_deduped
FROM documents d
LEFT JOIN ntok n USING (doc_id)
LEFT JOIN rebuilt r USING (doc_id)
"""
