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

from mediaduplicatefinder_spark.config import DEFAULT_CONFIG, EngineConfig
from mediaduplicatefinder_spark.functions.sigcore import SignatureComputer
from mediaduplicatefinder_spark.oracle.textsim import first_n_lines

SIG_SCHEMA = (
    "url string, lang string, size_bytes long, "
    "token_hashes array<long>, minhash array<long>, band_hashes array<long>, "
    "simhash1 long, simhash2 long, n_shingles int"
)


def compute_signatures(
    docs: DataFrame,
    cfg: EngineConfig = DEFAULT_CONFIG,
    min_partitions: int | None = None,
) -> DataFrame:
    """docs(url, lang, size_bytes, text) -> signature table (SIG_SCHEMA).

    ``token_hashes`` is the SORTED 64-bit hash set of the doc's shingles —
    the verify stage computes exact Jaccard on it via array_intersect on
    longs (cheaper to shuffle and intersect than string arrays; a 64-bit
    collision altering a score has probability ~ n_tokens^2 / 2^64).

    A single-file parquet scan arrives as ONE partition; repartition
    before the UDF so signature computation uses every core.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        comp = SignatureComputer(cfg)  # built once per task, reused per batch
        for pdf in batches:
            text50 = [first_n_lines(t or "", cfg.max_lines) for t in pdf["text"]]
            sigs = comp.compute(text50)
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "lang": pdf["lang"],
                    "size_bytes": pdf["size_bytes"],
                    "token_hashes": [list(map(int, t)) for t in sigs["token_hashes"]],
                    "minhash": [list(map(int, m)) for m in sigs["minhash"]],
                    "band_hashes": [list(map(int, b)) for b in sigs["band_hashes"]],
                    "simhash1": sigs["simhash1"],
                    "simhash2": sigs["simhash2"],
                    "n_shingles": sigs["n_shingles"],
                }
            )

    src = docs.select("url", "lang", "size_bytes", "text")
    if min_partitions:
        src = src.repartition(min_partitions)
    return src.mapInPandas(fn, schema=SIG_SCHEMA)
