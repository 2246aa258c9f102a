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
from mediaduplicatefinder_spark.functions.sigcore import SignatureComputer, token_seq
from mediaduplicatefinder_spark.oracle.textsim import first_n_lines

SIG_SCHEMA = (
    "url string, lang string, size_bytes long, "
    "tokens array<string>, minhash array<long>, band_hashes array<long>, "
    "simhash1 long, simhash2 long, n_shingles int"
)


def compute_signatures(docs: DataFrame, cfg: EngineConfig = DEFAULT_CONFIG) -> DataFrame:
    """docs(url, lang, size_bytes, text) -> signature table (SIG_SCHEMA)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        comp = SignatureComputer(cfg)  # built once per task, reused per batch
        for pdf in batches:
            text50 = [first_n_lines(t or "", cfg.max_lines) for t in pdf["text"]]
            sigs = comp.compute(text50)
            tokens = [
                list(dict.fromkeys(token_seq(t, cfg.min_token_len))) for t in text50
            ]
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "lang": pdf["lang"],
                    "size_bytes": pdf["size_bytes"],
                    "tokens": tokens,
                    "minhash": [list(map(int, m)) for m in sigs["minhash"]],
                    "band_hashes": [list(map(int, b)) for b in sigs["band_hashes"]],
                    "simhash1": sigs["simhash1"],
                    "simhash2": sigs["simhash2"],
                    "n_shingles": sigs["n_shingles"],
                }
            )

    return docs.select("url", "lang", "size_bytes", "text").mapInPandas(
        fn, schema=SIG_SCHEMA
    )
