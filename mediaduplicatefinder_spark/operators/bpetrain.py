"""Distributed BPE merge training (E133) — learn byte-pair-encoding
merge rules from the corpus itself (Sennrich/Haddow/Birch, "Neural
Machine Translation of Rare Words with Subword Units", ACL 2016).

The repo already APPLIES a fixed subword vocabulary exactly
(functions/wordpiece.py greedy maximal munch); this operator closes
the loop by LEARNING the vocabulary: the train-side job every corpus
pipeline runs once before tokenizing 100 TB.

Published algorithm, distributed shape:

1. the corpus collapses to the distinct-word count table — the ONLY
   thing BPE training reads (Sennrich's `get_vocabulary`); at web
   scale this is millions of rows where the corpus is trillions, so
   every round is cheap relative to one corpus pass;
2. each word starts as its character sequence + the ``</w>``
   end-of-word marker;
3. per round: count adjacent symbol pairs weighted by word count (one
   map-side-combining aggregation), pick the most frequent — ties
   broken (count DESC, left ASC, right ASC) so the result is
   deterministic across engines and partitionings (Sennrich's dict
   order is not) — then rewrite every word by merging that pair
   greedily left-to-right, non-overlapping (a single array fold; a
   symbol formed this round never cascades within the round).

Driver control per round is ONE collected row (the argmax rule — the
suffix-array/packing O(partitions) pattern); the vocab table is
re-persisted per round so round t+1 reads materialized sequences, not
a t-deep lineage.

Oracle: :func:`bpe_segments_sql` builds the value-exact DuckDB twin —
pair counts + argmax per round as plain CTEs, each round's merge
APPLICATION as a WITH RECURSIVE position walk carrying the accumulator
list (the wordpiece-oracle pattern), chained ``n_merges`` times.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

END = "</w>"


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, wcount) — the collapsed relation BPE trains on."""
    return (
        df.select(
            F.explode(
                F.filter(
                    F.split(F.trim(F.col(text_col)), r"\s+"),
                    lambda x: x != "",
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("wcount"))
    )


def _merge_fold(seq: Column, left: str, right: str) -> Column:
    """Greedy left-to-right non-overlapping application of one merge
    rule to a symbol array (the round's rewrite)."""
    merged = F.lit(left + right)
    return F.aggregate(
        seq,
        F.expr("CAST(array() AS array<string>)"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(merged)
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 3,
) -> tuple[list[tuple[int, str, str, int]], DataFrame]:
    """Learn ``n_merges`` rules; returns (merges, segments).

    merges: [(round, left, right, pair_count)] in learned order.
    segments: DataFrame (word, wcount, seg) — each distinct word's
    symbol sequence after all merges, space-joined."""
    chars = F.filter(
        F.split(F.col("word"), ""), lambda x: x != ""
    )
    vocab = word_counts(df, text_col).select(
        "word",
        "wcount",
        F.concat(chars, F.array(F.lit(END))).alias("seq"),
    )
    vocab = vocab.persist()
    merges: list[tuple[int, str, str, int]] = []
    for rnd in range(1, n_merges + 1):
        pairs = (
            # fully-merged single-symbol words contribute no pairs —
            # and F.sequence(1, 0) would DESCEND, not empty out
            vocab.filter(F.size("seq") >= 2)
            .select(
                "wcount",
                F.explode(
                    F.sequence(F.lit(1), F.size("seq") - 1)
                ).alias("i"),
                F.col("seq"),
            )
            .select(
                F.element_at("seq", F.col("i")).alias("l"),
                F.element_at("seq", F.col("i") + 1).alias("r"),
                "wcount",
            )
            .groupBy("l", "r")
            .agg(F.sum("wcount").alias("total"))
        )
        best = pairs.orderBy(
            F.desc("total"), F.asc("l"), F.asc("r")
        ).take(1)
        if not best:
            break
        b = best[0]
        merges.append((rnd, b.l, b.r, int(b.total)))
        nxt = vocab.select(
            "word", "wcount", _merge_fold(F.col("seq"), b.l, b.r).alias("seq")
        ).persist()
        nxt.count()  # materialize before dropping the parent
        vocab.unpersist()
        vocab = nxt
    segments = vocab.select(
        "word", "wcount", F.concat_ws(" ", "seq").alias("seg")
    )
    return merges, segments


# ------------------------------------------------------------- oracle


def bpe_segments_sql(
    source: str = "SELECT text FROM documents",
    n_merges: int = 3,
) -> str:
    """DuckDB twin of :func:`bpe_train`'s ``segments`` output: the
    whole training loop — pair counts, deterministic argmax, and a
    recursive-CTE merge walk per round — unrolled ``n_merges`` times
    in one WITH RECURSIVE block."""
    ctes = [
        f"""src AS ({source}),
words AS MATERIALIZED (
  SELECT w AS word, count(*)::BIGINT AS wcount
  FROM (SELECT unnest(list_filter(string_split_regex(trim(text), '\\s+'),
                                  x -> x <> '')) AS w FROM src)
  GROUP BY w
),
vocab0 AS MATERIALIZED (
  SELECT word, wcount,
         list_append(string_split(word, ''), '{END}') AS seq
  FROM words
)"""
    ]
    for t in range(1, n_merges + 1):
        p = t - 1
        ctes.append(
            f"""pairs{t} AS MATERIALIZED (
  SELECT seq[i] AS l, seq[i + 1] AS r, sum(wcount)::BIGINT AS total
  FROM (SELECT word, wcount, seq,
               unnest(range(1, len(seq))) AS i
        FROM vocab{p})
  GROUP BY seq[i], seq[i + 1]
),
best{t} AS MATERIALIZED (
  SELECT l, r, l || r AS lr FROM pairs{t}
  ORDER BY total DESC, l ASC, r ASC LIMIT 1
),
walk{t}(word, wcount, i, acc) AS (
  SELECT word, wcount, 1, CAST([] AS VARCHAR[]) FROM vocab{p}
  UNION ALL
  SELECT w.word, w.wcount, w2.i + 1,
         CASE WHEN len(w2.acc) > 0
                   AND w2.acc[len(w2.acc)] = b.l
                   AND v.seq[w2.i] = b.r
              THEN list_slice(w2.acc, 1, len(w2.acc) - 1) || [b.lr]
              ELSE w2.acc || [v.seq[w2.i]] END
  FROM walk{t} w2
  JOIN vocab{p} v ON v.word = w2.word
  JOIN words w ON w.word = w2.word
  CROSS JOIN best{t} b
  WHERE w2.i <= len(v.seq)
),
vocab{t} AS MATERIALIZED (
  SELECT w2.word, w2.wcount, w2.acc AS seq
  FROM walk{t} w2 JOIN vocab{p} v ON v.word = w2.word
  WHERE w2.i = len(v.seq) + 1
)"""
        )
    body = ",\n".join(ctes)
    return f"""WITH RECURSIVE {body}
SELECT word, wcount, array_to_string(seq, ' ') AS seg
FROM vocab{n_merges}
"""
