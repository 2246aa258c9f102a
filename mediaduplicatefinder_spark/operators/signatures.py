"""Per-document signature computation (SURVEY.md §7 step 3).

One mapInPandas pass computes, per doc, from the first-50-lines
truncated text (main_cli.cpp:260-270):

- ``tokens``      distinct normalized tokens (P5, main_cli.cpp:272-283)
                  — used by the exact-Jaccard verify stage
- ``minhash``     r*b-long MinHash signature (engine-new, enables LSH)
- ``band_hashes`` b per-band hashes (LSH join keys)
- ``simhash1/2``  two independent 64-bit SimHashes (P1/P2 roles,
                  main_cli.cpp:161-209)
- ``n_shingles``  signature support size

numpy-vectorized via functions.sigcore (shared with the oracle —
bit-identical by construction, partition-invariant).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mediaduplicatefinder_spark.config import DEFAULT_CONFIG, EngineConfig
from mediaduplicatefinder_spark.functions.sigcore import SignatureComputer
from mediaduplicatefinder_spark.functions.hashing import fold32
from mediaduplicatefinder_spark.oracle.textsim import first_n_lines

SIG_SCHEMA = (
    "url string, lang string, size_bytes long, "
    "token_hashes array<int>, minhash array<long>, band_hashes array<long>, "
    "simhash1 long, simhash2 long, n_shingles int"
)

# pipeline-path schema: the full r*b minhash signature (~1 KB/doc) is an
# intermediate of band hashing — the pipeline never reads it, so skipping
# it halves the Arrow transfer + cache footprint of the signature table
SIG_SCHEMA_SLIM = (
    "url string, lang string, size_bytes long, "
    "token_hashes array<int>, band_hashes array<long>, "
    "simhash1 long, simhash2 long, n_shingles int"
)

# The hot path (banding, candidate dedupe, verify joins, connected
# components) keys rows by ``doc_key = xxhash64(url)`` instead of the
# ~60-100 byte url string: ~8x less shuffle/band traffic at any scale.
# 64-bit birthday collisions are negligible at bench scale (n=1e5 ->
# P ~ 3e-10); a 10^12-doc deployment upgrades doc_key to the 128-bit
# pair (xxhash64(url, seed1), xxhash64(url, seed2)) — same plan shape.


def compute_signatures(
    docs: DataFrame,
    cfg: EngineConfig = DEFAULT_CONFIG,
    min_partitions: int | None = None,
    include_minhash: bool = True,
) -> DataFrame:
    """docs(url, lang, size_bytes, text) -> signature table (SIG_SCHEMA).

    ``token_hashes`` is the SORTED xor-folded 32-bit hash set of the
    doc's shingles — the verify stage computes exact Jaccard on it via a
    sorted merge. 32-bit (not 64) halves the verify join's shuffle
    bytes, the pipeline's largest data mover; a fold collision shifts a
    pair's Jaccard by ~1/|tokens| with probability ~|A||B|/2^32 ~ 1e-5
    per pair — orders of magnitude inside the 0.99-recall budget, and
    deterministic (same fold both sides of any comparison).

    A single-file parquet scan arrives as ONE partition; repartition
    before the UDF so signature computation uses every core.
    """

    schema = SIG_SCHEMA if include_minhash else SIG_SCHEMA_SLIM

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        comp = SignatureComputer(cfg)  # built once per task, reused per batch
        for pdf in batches:
            text50 = [first_n_lines(t or "", cfg.max_lines) for t in pdf["text"]]
            sigs = comp.compute(text50)
            cols = {
                "url": pdf["url"],
                "lang": pdf["lang"],
                "size_bytes": pdf["size_bytes"],
                "token_hashes": [
                    fold32(t) for t in sigs["token_hashes"]
                ],
            }
            if include_minhash:  # keep dict insertion = schema column order
                cols["minhash"] = [list(map(int, m)) for m in sigs["minhash"]]
            cols.update(
                {
                    "band_hashes": [list(map(int, b)) for b in sigs["band_hashes"]],
                    "simhash1": sigs["simhash1"],
                    "simhash2": sigs["simhash2"],
                    "n_shingles": sigs["n_shingles"],
                }
            )
            yield pd.DataFrame(cols)

    src = docs.select("url", "lang", "size_bytes", "text")
    # repartition only on a REAL deficit (tiny single-split inputs):
    # shuffling the full text to go from e.g. 28 to 32 partitions
    # costs more than the extra slots buy
    if min_partitions and src.rdd.getNumPartitions() < max(2, min_partitions // 2):
        src = src.repartition(min_partitions)
    out = src.mapInPandas(fn, schema=schema)
    return out.withColumn("doc_key", F.xxhash64("url"))
