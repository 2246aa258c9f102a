"""LSH Ensemble containment index (E174): Zhu / Nazi / Mai / He /
Miller, "LSH Ensemble: Internet-Scale Domain Search" (VLDB 2016).

The problem it owns: CONTAINMENT search C(Q,X) = |Q∩X|/|Q| ≥ t when
corpus set sizes span orders of magnitude.  Plain MinHash banding is
tuned for a Jaccard threshold, but a small query contained in a big
document has J ≈ |Q|/|X| — far below any fixed banding's operating
point, so the standard channel never fires (the E80 inverted-index
channel answers this exactly but carries the full posting volume).
LSH Ensemble's construction:

1. PARTITION the corpus by set size (geometric boundaries here:
   partition p holds docs with floor(log2(n_shingles)) in
   [p·w, (p+1)·w); the last partition is open-ended).  Within a
   partition the size ratio is bounded, so the containment threshold
   converts to a per-partition Jaccard threshold
   ``J_p = t·q / (q + U_p − t·q)`` (U_p = partition upper size bound,
   q = reference query size).
2. TUNE (b_p, r_p) per partition for J_p with the standard S-curve
   optimizer (functions/lshtune.tune_lsh — the same budget of
   num_perm MinHash values; big partitions end up at r=1, wide b:
   the high-sensitivity end of the family).
3. INDEX each partition with its own banding over the SAME per-doc
   MinHash signature (one signature pass serves every partition —
   band folds are slices of it), and PROBE each partition with the
   query's bands folded under that partition's (b_p, r_p).
4. VERIFY candidates with exact containment from the fold-32 token
   sets; keep C ≥ t.

Simplification vs the paper, documented: the paper re-derives the
equivalent Jaccard threshold per QUERY at query time and adapts how
much of the index to probe; here the per-partition tuning is fixed at
build time against a reference query size ``q_ref`` (the conservative
small-query end).  Recall for q ≥ q_ref only improves (J is monotone
in q), so the fixture gate below the oracle still binds.

Scale shape: the signature pass is shared (one mapInPandas already in
the pipeline); band folds are numpy slices of it (the oph_band_hashes
chain — bit-identical to the SQL twin's fold CTEs); the probe is one
equi hash join on (lang, part, band, bh); verification joins move
fold-32 arrays only.  Partitioning bounds bucket skew the same way it
bounds the J conversion: a partition's buckets only ever hold
same-scale documents.

Everything deterministic: partition = exact integer bit-length,
(b_p, r_p) integers from the shared tuner, folds from pinned splitmix
constants — the DuckDB twin re-derives all of it value-exactly.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mediaduplicatefinder_spark.config import DEFAULT_CONFIG, EngineConfig
from mediaduplicatefinder_spark.functions import hashing
from mediaduplicatefinder_spark.functions.lshtune import tune_lsh
from mediaduplicatefinder_spark.functions.oph import oph_band_hashes


@dataclass(frozen=True)
class EnsemblePart:
    part: int
    lo: int      # smallest n_shingles in the partition (2^(part*w))
    upper: int   # tuning upper size bound U_p
    bands: int
    rows: int


def ensemble_plan(
    t: float = 0.5,
    num_perm: int = 128,
    n_partitions: int = 4,
    part_width: int = 3,
    q_ref: int = 16,
) -> list[EnsemblePart]:
    """Per-partition (b, r) — the single source of truth shared by the
    Spark operator, the pytest reference, and the SQL twin generator."""
    plans = []
    for p in range(n_partitions):
        upper = (1 << ((p + 1) * part_width)) - 1
        j_eq = t * q_ref / (q_ref + upper - t * q_ref)
        plan = tune_lsh(min(max(j_eq, 1e-6), 0.999999), num_perm)
        plans.append(
            EnsemblePart(
                part=p,
                lo=1 << (p * part_width),
                upper=upper,
                bands=plan.bands,
                rows=plan.rows,
            )
        )
    return plans


def _ilog2(n: int) -> int:
    return max(int(n).bit_length() - 1, 0)


def part_of(n_shingles: int, part_width: int, n_partitions: int) -> int:
    return min(_ilog2(n_shingles) // part_width, n_partitions - 1)


BAND_SCHEMA = "url string, lang string, part int, band int, bh long"


def _band_rows(
    sigs: DataFrame,
    plans: list[EnsemblePart],
    part_width: int,
    probe_all: bool,
) -> DataFrame:
    """(url, lang, part, band, bh): per-partition band folds of the
    full MinHash signature.  Corpus rows fold only their own
    partition's config; query rows (probe_all) fold every config."""
    n_partitions = len(plans)

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            sig = np.array(
                [np.asarray(m, dtype=np.int64) for m in pdf["minhash"]],
                dtype=np.int64,
            ).view(np.uint64)
            parts = np.array(
                [
                    part_of(int(n), part_width, n_partitions)
                    for n in pdf["n_shingles"]
                ],
                dtype=np.int64,
            )
            out: dict[str, list] = {
                "url": [], "lang": [], "part": [], "band": [], "bh": []
            }
            for pl in plans:
                take = (
                    np.arange(len(pdf))
                    if probe_all
                    else np.flatnonzero(parts == pl.part)
                )
                if not len(take):
                    continue
                folds = hashing.to_int64(
                    oph_band_hashes(
                        sig[take, : pl.bands * pl.rows], pl.bands, pl.rows
                    )
                )
                urls = pdf["url"].to_numpy()[take]
                langs = pdf["lang"].to_numpy()[take]
                for j in range(pl.bands):
                    out["url"].extend(urls)
                    out["lang"].extend(langs)
                    out["part"].extend([pl.part] * len(take))
                    out["band"].extend([j] * len(take))
                    out["bh"].extend(int(x) for x in folds[:, j])
            yield pd.DataFrame(out)

    return (
        sigs.filter(F.col("n_shingles") > 0)
        .select("url", "lang", "n_shingles", "minhash")
        .mapInPandas(fn, BAND_SCHEMA)
    )


def lsh_ensemble_containment(
    sigs_corpus: DataFrame,
    sigs_query: DataFrame,
    t: float = 0.5,
    cfg: EngineConfig = DEFAULT_CONFIG,
    n_partitions: int = 4,
    part_width: int = 3,
    q_ref: int = 16,
) -> DataFrame:
    """(url_q, url_x, containment): query sets whose exact containment
    in a corpus set reaches t, candidates surfaced by the per-partition
    tuned band probe.  Signatures must carry ``minhash`` (the full
    num_perm signature: compute_signatures include_minhash=True)."""
    plans = ensemble_plan(t, cfg.num_perm, n_partitions, part_width, q_ref)
    corpus = _band_rows(sigs_corpus, plans, part_width, probe_all=False)
    query = _band_rows(sigs_query, plans, part_width, probe_all=True)

    cands = (
        query.select(
            "lang", "part", "band", "bh", F.col("url").alias("url_q")
        )
        .join(
            corpus.select(
                "lang", "part", "band", "bh", F.col("url").alias("url_x")
            ),
            ["lang", "part", "band", "bh"],
        )
        .filter(F.col("url_q") != F.col("url_x"))
        .select("url_q", "url_x")
        .dropDuplicates(["url_q", "url_x"])
    )

    def toks(sigs: DataFrame, tag: str) -> DataFrame:
        return sigs.select(
            F.col("url").alias(f"url_{tag}"),
            F.array_distinct("token_hashes").alias(f"th_{tag}"),
        )

    cont = F.size(F.array_intersect("th_q", "th_x")).cast("double") / F.size(
        "th_q"
    )
    return (
        cands.join(toks(sigs_query, "q"), "url_q")
        .join(toks(sigs_corpus, "x"), "url_x")
        .withColumn("containment", cont)
        .filter(F.col("containment") >= F.lit(t))
        .select("url_q", "url_x", "containment")
    )


# ---------------------------------------------------------------- oracle
def lsh_ensemble_sql(
    docs_sql: str,
    t: float = 0.5,
    num_perm: int = 128,
    n_partitions: int = 4,
    part_width: int = 3,
    q_ref: int = 16,
    query_pred: str = "CAST(substr(url, 7, 10) AS BIGINT) % 10 = 7",
) -> str:
    """DuckDB twin: the ENTIRE ensemble re-derived — per-partition
    band folds of the mh signature relation (same splitmix chain, same
    (b_p, r_p) from the SHARED ensemble_plan), exact-integer partition
    assignment via printf('%b') bit length, the probe join, and the
    fold-32 exact-containment verify.  Fold CTEs are emitted once per
    DISTINCT (bands, rows) pair."""
    import numpy as np

    from mediaduplicatefinder_spark.functions import hashing
    from mediaduplicatefinder_spark.oracle.lsh_sql import (
        lsh_base_cte,
        splitmix_nest,
    )

    plans = ensemble_plan(t, num_perm, n_partitions, part_width, q_ref)
    ctes: list[str] = []
    emitted: set = set()
    for pl in plans:
        key = (pl.bands, pl.rows)
        if key in emitted:
            continue
        emitted.add(key)
        b, r = key
        accs = hashing.splitmix64(np.arange(b, dtype=np.uint64))
        acc_rows = ", ".join(
            f"({j}, {int(a)}::UBIGINT)" for j, a in enumerate(accs)
        )
        ctes.append(f"eacc_{b}_{r}(band, acc0) AS (VALUES {acc_rows})")
        ctes.append(
            f"em_{b}_{r} AS (SELECT url, i // {r} AS band,"
            f" list(mh ORDER BY i) AS m FROM mh WHERE i < {b * r}"
            f" GROUP BY url, i // {r})"
        )
        fold_q = (
            f"SELECT url, band, m, acc0 AS acc FROM em_{b}_{r}"
            f" JOIN eacc_{b}_{r} USING (band)"
        )
        for i in range(r):
            fold_q = splitmix_nest(
                fold_q, f"xor(acc, m[{i + 1}])", "nxt",
                ["url", "band", "m"], f"e{b}_{r}_{i}",
            )
            fold_q = f"SELECT url, band, m, nxt AS acc FROM ({fold_q})"
        ctes.append(
            f"eb_{b}_{r} AS (SELECT url, band, acc AS bh FROM ({fold_q}))"
        )

    ctes.append(
        f"epart AS (SELECT url, least((length(printf('%b', n_shingles))"
        f" - 1) // {part_width}, {n_partitions - 1}) AS part"
        f" FROM doc_stats)"
    )
    ctes.append(
        f"equery AS (SELECT url FROM doc_stats WHERE {query_pred})"
    )
    corpus_union = "\n  UNION ALL\n".join(
        f"SELECT b.url, {pl.part} AS part, b.band, b.bh"
        f" FROM eb_{pl.bands}_{pl.rows} b JOIN epart p USING (url)"
        f" WHERE p.part = {pl.part}"
        f" AND b.url NOT IN (SELECT url FROM equery)"
        for pl in plans
    )
    ctes.append(f"ecorpus AS ({corpus_union})")
    query_union = "\n  UNION ALL\n".join(
        f"SELECT b.url, {pl.part} AS part, b.band, b.bh"
        f" FROM eb_{pl.bands}_{pl.rows} b"
        f" JOIN equery USING (url)"
        for pl in plans
    )
    ctes.append(f"equery_bands AS ({query_union})")
    ctes.append(
        """ecand AS (
  SELECT DISTINCT q.url AS url_q, c.url AS url_x
  FROM equery_bands q
  JOIN ecorpus c ON q.part = c.part AND q.band = c.band AND q.bh = c.bh
  JOIN doc_stats dq ON dq.url = q.url
  JOIN doc_stats dx ON dx.url = c.url AND dq.lang = dx.lang
  WHERE q.url <> c.url
)"""
    )
    return (
        lsh_base_cte(docs_sql=docs_sql)
        + ", "
        + ",\n".join(ctes)
        + f"""
SELECT url_q, url_x, containment FROM (
  SELECT c.url_q, c.url_x,
         coalesce(i.inter, 0)::DOUBLE / nq.nf AS containment
  FROM ecand c
  JOIN nfold nq ON nq.url = c.url_q
  LEFT JOIN (
    SELECT c2.url_q, c2.url_x, count(*) AS inter
    FROM ecand c2
    JOIN fold fa ON fa.url = c2.url_q
    JOIN fold fb ON fb.url = c2.url_x AND fb.f = fa.f
    GROUP BY 1, 2
  ) i ON i.url_q = c.url_q AND i.url_x = c.url_x
) WHERE containment >= {t}
"""
    )
