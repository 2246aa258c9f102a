"""LSH candidate-pair generation (replaces the reference's O(n²)
nested-loop J1, main_cli.cpp:598-617) with explicit skew handling
(SURVEY.md §4.3 item 1).

Two candidate channels, unioned then deduped:

- MinHash bands: equality on (lang, band, band_hash) — P(candidate | J)
  = 1-(1-J^r)^b, tuned so J > 0.6 pairs (the reference text threshold)
  are caught with p >= 0.99.
- SimHash bands: 8x8-bit chunks of each of the two SimHashes — the
  Hamming-proximity channel (P4 role).

Skew: a boilerplate-heavy shard puts thousands of docs in one
(band, hash) bucket; all-pairs there is inherently quadratic. Buckets
wider than ``cfg.bucket_cap`` switch to CHAIN mode — members sorted by
url, only adjacent pairs emitted (O(n) per bucket). A bucket that is one
true near-dup cluster stays fully connected through the chain +
connected components, so recall is preserved for the dominant skew case
(identical-template farms); genuinely mixed giant buckets lose only
cross-cluster comparisons, and the count of capped buckets/docs is
reported in the metrics table (no silent caps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mediaduplicatefinder_spark.config import DEFAULT_CONFIG, EngineConfig


def _minhash_bands(sigs: DataFrame) -> DataFrame:
    return sigs.select(
        "url", "lang", F.posexplode("band_hashes").alias("band", "bh")
    )


def _simhash_bands(sigs: DataFrame, cfg: EngineConfig) -> DataFrame:
    """8-bit chunks of simhash1/simhash2 as extra band channels; band ids
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
        "url", "lang", F.explode(F.array(*chunks)).alias("c")
    ).select("url", "lang", F.col("c.band").alias("band"), F.col("c.bh").alias("bh"))


def candidate_pairs(
    sigs: DataFrame,
    cfg: EngineConfig = DEFAULT_CONFIG,
    use_simhash_channel: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """signature table -> (candidates(url_a, url_b, lang), bucket_metrics).

    One shuffle on (lang, band, bh) serves bucket sizing, chain ranking
    and the self-join. Pair identity is canonicalized url_a < url_b
    (the reference's i<j scan, main_cli.cpp:629-705) and deduped across
    bands/channels before the expensive verify stage (SE4 insight:
    score each pair once).
    """
    bands = _minhash_bands(sigs)
    if use_simhash_channel:
        bands = bands.unionByName(_simhash_bands(sigs, cfg))

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

    a = small.select(
        "lang", "band", "bh", F.col("url").alias("url_a"), F.col("rn").alias("rn_a")
    )
    b = small.select(
        "lang", "band", "bh", F.col("url").alias("url_b"), F.col("rn").alias("rn_b")
    )
    pairs_small = a.join(b, ["lang", "band", "bh"]).filter(
        F.col("rn_a") < F.col("rn_b")
    )

    ba = big.select(
        "lang", "band", "bh", F.col("url").alias("url_a"), F.col("rn").alias("rn_a")
    )
    bb = big.select(
        "lang", "band", "bh", F.col("url").alias("url_b"), F.col("rn").alias("rn_b")
    )
    pairs_big = ba.join(bb, ["lang", "band", "bh"]).filter(
        F.col("rn_b") == F.col("rn_a") + 1
    )

    cands = (
        pairs_small.select("lang", "url_a", "url_b")
        .unionByName(pairs_big.select("lang", "url_a", "url_b"))
        .dropDuplicates(["url_a", "url_b"])
    )
    return cands, bucket_metrics
