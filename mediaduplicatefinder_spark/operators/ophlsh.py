"""One-permutation-hashing LSH channel (E172): signatures at ~1/128th
the hash cost of the standard 128-permutation MinHash pass.

See functions/oph.py for the algorithm (Li/Owen/Zhang NIPS'12 bin-min
+ Shrivastava/Li ICML'14 rotation densification) and why it matters at
100 TB: the signature pass is the pipeline's map-side hot loop, and
standard MinHash re-mixes the corpus token stream once per permutation.

Relation to the reference: same role as the engine's MinHash channel —
estimate the reference's token-set Jaccard (main_cli.cpp:285-294) well
enough that band collisions surface candidate pairs; the verify stage
(exact set Jaccard > 0.6, main_cli.cpp:312) is unchanged, so the
channel's false positives cost work but never correctness.

Spark shape:

- ONE mapInPandas pass computes tokenization (shared sigcore helpers —
  bit-identical normalization), the single-remix scatter-min OPH
  signature, the rotation fill, and the band fold (the IDENTICAL
  splitmix accumulator chain the standard channel uses).
- Banding + candidate generation + verification are pure DataFrame
  ops: posexplode bands, equi self-join on (lang, band, bh), exact
  Jaccard via array_intersect/array_union on the sorted-distinct
  token-hash sets — all JVM-side, zero Python below the signature UDF.
- Verification joins follow the SE4 compute-once shape: token sets
  ride the signature relation; the pair join moves slim columns only.

The DuckDB twin (oracle/lsh_sql.oph_lsh_pairs_sql) re-derives the
ENTIRE channel in SQL — remix, bin-min, the circular rotation fill as
a doubled-position window suffix-min, the band fold, candidates, and
exact Jaccard — so the driver's value check proves the distributed
plan equals the published algorithm bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mediaduplicatefinder_spark.config import DEFAULT_CONFIG, EngineConfig
from mediaduplicatefinder_spark.functions import hashing
from mediaduplicatefinder_spark.functions.oph import (
    oph_band_hashes,
    oph_signature_batch,
)
from mediaduplicatefinder_spark.functions.sigcore import shingle_set, token_seq

OPH_SCHEMA = (
    "url string, lang string, token_hashes array<long>, "
    "band_hashes array<long>, n_shingles int"
)


def oph_signatures(
    docs: DataFrame, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """(url, lang, token_hashes, band_hashes, n_shingles): densified
    OPH signatures folded to cfg.minhash_bands band hashes.  The single
    permutation seed is cfg.minhash_seed (the twin embeds the same
    constant).  token_hashes is the sorted-DISTINCT int64 fnv1a64
    shingle set — the exact-Jaccard verify input."""
    P = cfg.num_perm
    b, r = cfg.minhash_bands, cfg.minhash_rows
    seed = cfg.minhash_seed

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            hl = [
                hashing.fnv1a64(
                    shingle_set(
                        token_seq(t or "", cfg.min_token_len), cfg.shingle_k
                    )
                )
                for t in pdf["text"]
            ]
            sig = oph_signature_batch(hl, P, seed)
            bandh = oph_band_hashes(sig, b, r)
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "lang": pdf["lang"],
                    "token_hashes": [
                        np.unique(hashing.to_int64(h)) for h in hl
                    ],
                    "band_hashes": list(hashing.to_int64(bandh)),
                    "n_shingles": [len(h) for h in hl],
                }
            )

    return docs.select("url", "lang", "text").mapInPandas(fn, OPH_SCHEMA)


def oph_lsh_pairs(
    docs: DataFrame, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """(url_a, url_b, score): verified near-dup pairs from the OPH band
    channel — band-collision candidates, then the reference's exact
    token-set Jaccard > cfg.jaccard_threshold decision."""
    sigs = oph_signatures(docs, cfg).filter(F.col("n_shingles") > 0)

    bands = sigs.select(
        "url",
        "lang",
        F.posexplode("band_hashes").alias("band", "bh"),
    )
    cands = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.url") < F.col("b.url")),
        )
        .select(
            F.col("a.url").alias("url_a"), F.col("b.url").alias("url_b")
        )
        .dropDuplicates(["url_a", "url_b"])
    )

    toks = sigs.select("url", "token_hashes")
    jac = F.size(F.array_intersect("th_a", "th_b")).cast("double") / F.size(
        F.array_union("th_a", "th_b")
    )
    return (
        cands.join(
            toks.select(
                F.col("url").alias("url_a"),
                F.col("token_hashes").alias("th_a"),
            ),
            "url_a",
        )
        .join(
            toks.select(
                F.col("url").alias("url_b"),
                F.col("token_hashes").alias("th_b"),
            ),
            "url_b",
        )
        .withColumn("score", jac)
        .filter(F.col("score") > F.lit(cfg.jaccard_threshold))
        .select("url_a", "url_b", "score")
    )
