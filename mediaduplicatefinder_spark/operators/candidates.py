"""LSH candidate-pair generation (replaces the reference's O(n²)
nested-loop J1, main_cli.cpp:598-617) with explicit skew handling
(SURVEY.md §4.3 item 1).

Two candidate channels, unioned then deduped:

- MinHash bands: equality on (lang, band, band_hash) — P(candidate | J)
  = 1-(1-J^r)^b, tuned so J > 0.6 pairs (the reference text threshold)
  are caught with p >= 0.99.
- SimHash bands: 16-bit chunks of each of the two SimHashes — the
  Hamming-proximity channel (P4 role); guarantees Hamming <= 3 per hash
  and avoids the random-collision flood 8-bit chunks produce.

Cheap prefilters are applied AT PAIR GENERATION, before the dedupe
shuffle (the reference's cheap-predicate-first staging, §4.1):

- empty docs (n_shingles = 0) never enter banding — empty text is never
  similar (main_cli.cpp:286), and their identical MinHash signatures
  would otherwise form one giant junk bucket;
- size-ratio >= 0.3 (F2, main_cli.cpp:297-299);
- shingle-count ratio > jaccard_threshold — a strict upper bound
  (J <= min(|A|,|B|)/max(|A|,|B|)), so pruning is provably
  recall-neutral for the Jaccard decision.

Skew: a boilerplate-heavy shard puts thousands of docs in one
(band, hash) bucket; all-pairs there is inherently quadratic. Buckets
wider than ``cfg.bucket_cap`` switch to CHAIN mode — members sorted by
url, only adjacent pairs emitted (O(n) per bucket). A single-cluster hot
bucket stays fully connected through the chain + connected components
(dup pairs are counted on cluster co-membership), and capped
bucket/doc counts are reported in the metrics table (no silent caps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mediaduplicatefinder_spark.config import DEFAULT_CONFIG, EngineConfig
from mediaduplicatefinder_spark.functions.text import size_ratio_expr

_BAND_COLS = ("url", "lang", "size_bytes", "n_shingles")


def _minhash_bands(sigs: DataFrame) -> DataFrame:
    return sigs.select(
        *_BAND_COLS, F.posexplode("band_hashes").alias("band", "bh")
    )


def _simhash_bands(sigs: DataFrame, cfg: EngineConfig) -> DataFrame:
    """16-bit chunks of simhash1/simhash2 as extra band channels; band ids
    offset past the MinHash bands to keep key spaces disjoint."""
    nb = cfg.simhash_bands
    chunks = []
    for which, col in ((0, "simhash1"), (1, "simhash2")):
        for i in range(nb):
            band_id = cfg.minhash_bands + which * nb + i
            chunk = (
                F.shiftrightunsigned(F.col(col), i * cfg.simhash_band_bits)
                .bitwiseAND(F.lit((1 << cfg.simhash_band_bits) - 1))
            )
            chunks.append(
                F.struct(F.lit(band_id).alias("band"), chunk.alias("bh"))
            )
    return sigs.select(
        *_BAND_COLS, F.explode(F.array(*chunks)).alias("c")
    ).select(*_BAND_COLS, F.col("c.band").alias("band"), F.col("c.bh").alias("bh"))


def _pair_select(side: DataFrame, suffix: str) -> DataFrame:
    return side.select(
        "lang",
        "band",
        "bh",
        F.col("url").alias(f"url_{suffix}"),
        F.col("rn").alias(f"rn_{suffix}"),
        F.col("size_bytes").alias(f"size_{suffix}"),
        F.col("n_shingles").alias(f"n_{suffix}"),
    )


def candidate_pairs(
    sigs: DataFrame,
    cfg: EngineConfig = DEFAULT_CONFIG,
    use_simhash_channel: bool = True,
    prune_by_shingle_ratio: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """signature table -> (candidates(lang, url_a, url_b, size_ratio),
    bucket_metrics).

    One shuffle on (lang, band, bh) serves bucket sizing, chain ranking
    and the self-join. Pair identity is canonicalized url_a < url_b
    (the reference's i<j scan, main_cli.cpp:629-705) and deduped across
    bands/channels before the expensive verify stage (SE4 insight:
    score each pair once).
    """
    nonempty = sigs.filter(F.col("n_shingles") > 0)
    bands = _minhash_bands(nonempty)
    if use_simhash_channel:
        bands = bands.unionByName(_simhash_bands(nonempty, cfg))

    w = Window.partitionBy("lang", "band", "bh")
    ranked = bands.withColumn("bucket_n", F.count("*").over(w)).withColumn(
        "rn", F.row_number().over(w.orderBy("url"))
    )
    # buckets of 1 generate nothing; drop before the self-join
    ranked = ranked.filter(F.col("bucket_n") >= 2).persist()

    bucket_metrics = (
        ranked.filter(F.col("rn") == 1)
        .select(
            F.count("*").alias("n_buckets"),
            F.sum("bucket_n").alias("n_bucket_members"),
            F.max("bucket_n").alias("max_bucket"),
            F.sum(F.when(F.col("bucket_n") > cfg.bucket_cap, 1).otherwise(0)).alias(
                "capped_buckets"
            ),
            F.sum(
                F.when(F.col("bucket_n") > cfg.bucket_cap, F.col("bucket_n")).otherwise(0)
            ).alias("capped_docs"),
        )
    )

    small = ranked.filter(F.col("bucket_n") <= cfg.bucket_cap)
    big = ranked.filter(F.col("bucket_n") > cfg.bucket_cap)

    pairs_small = _pair_select(small, "a").join(
        _pair_select(small, "b"), ["lang", "band", "bh"]
    ).filter(F.col("rn_a") < F.col("rn_b"))
    # CHAIN (adjacent) + STAR (first->member) edges: 2(n-1) per hot bucket.
    # Star edges give the component diameter ~2 when the bucket is one true
    # cluster, so connected components converges in O(1) rounds instead of
    # O(log n) pointer-jumping over a pure chain; chain edges keep
    # connectivity even where the star center fails verify.
    pairs_big = _pair_select(big, "a").join(
        _pair_select(big, "b"), ["lang", "band", "bh"]
    ).filter(
        (F.col("rn_b") == F.col("rn_a") + 1)
        | ((F.col("rn_a") == 1) & (F.col("rn_b") > 2))
    )

    raw = pairs_small.unionByName(pairs_big)

    # cheap prefilters BEFORE the dedupe shuffle
    raw = raw.withColumn(
        "size_ratio", size_ratio_expr(F.col("size_a"), F.col("size_b"))
    ).filter(F.col("size_ratio") >= F.lit(cfg.size_ratio_min))
    if prune_by_shingle_ratio:
        bound = size_ratio_expr(
            F.col("n_a").cast("long"), F.col("n_b").cast("long")
        )
        raw = raw.filter(bound > F.lit(cfg.jaccard_threshold))

    cands = raw.select("lang", "url_a", "url_b", "size_ratio").dropDuplicates(
        ["url_a", "url_b"]
    )
    # materialize candidates + metrics once, then free the banded table —
    # leaving it persisted degrades every downstream stage (GC pressure)
    cands = cands.localCheckpoint(eager=True)
    bucket_metrics = bucket_metrics.localCheckpoint(eager=True)
    ranked.unpersist()
    return cands, bucket_metrics
