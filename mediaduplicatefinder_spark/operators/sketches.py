"""Distributed cardinality sketches: HyperLogLog + KMV (E75).

At 10^12 documents, "how many distinct urls / hosts / chunk hashes does
this snapshot hold" is itself a first-class query, and exact
count-distinct is a full shuffle of every key.  The two classic
mergeable sketches answer it with bounded state per group:

- **HyperLogLog** (Flajolet et al., AofA 2007): bucket = top ``p`` bits
  of a 64-bit hash, register = max over the bucket of (1 + number of
  trailing zeros of the remaining bits).  The register table is a
  ``groupBy(grp, bucket).max`` — map-side partial agg, at most
  ``m = 2^p`` 1-byte-entropy rows per group ever shuffle.  Estimate =
  ``alpha_m * m^2 / sum(2^-reg)`` with the standard linear-counting
  fallback when the raw estimate is <= 2.5m and empty registers remain.
- **KMV / bottom-k** (Bar-Yossef et al., RANDOM 2002): the k-th
  smallest distinct hash value ``u`` (unsigned order) estimates
  ``(k-1) * 2^64 / u``; with fewer than k distinct hashes the sketch
  IS the exact answer.

Cross-engine determinism (the whole point of this formulation):

- hash = Spark ``xxhash64`` (seed 42); the DuckDB twin reuses the
  pinned 16-byte-key XXH64 port (oracle/lsh_sql.xxh64_doc_key_cte) —
  inputs must be exactly-16-byte urls, same contract as every other
  xxh64-channel oracle.
- trailing-zero count is a pure integer lookup: ``lsb = v & -v``
  isolates the lowest set bit (a power of two), and a literal
  58-entry map/CASE sends ``2^t -> t``.  No log2, no clz, no float.
- the HLL accumulator is the *integer* ``sum(2^(40 - min(reg,40)))``
  (capped registers; both engines apply the same cap, and a register
  > 40 needs ~2^40 items per bucket) — so ``hll_zsum`` is a hard
  integer check, and the estimate is ONE double division by a <= 2^46
  integer (exact in f64) against a Python-computed literal numerator.
- the linear-counting branch's ``m * ln(m/zeros)`` has only ``m``
  possible inputs, so both engines read the SAME Python-computed
  literal table indexed by ``zeros`` — no libm in either engine.
- the KMV divisor converts a full 64-bit unsigned to double with ONE
  rounding via hi*2^32 + lo (hi, lo <= 2^32 are exact; the product is
  an exact shift), identical in both engines.

Scale shape: HLL is one narrow shuffle of (grp, bucket, rho) with
map-side combine.  KMV prunes to the k smallest per (grp, input
partition) BEFORE the global per-group sort — the global window only
ever sees <= k * n_partitions rows per group (the result is invariant
to the partition assignment, so the oracle needs no notion of it).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mediaduplicatefinder_spark.oracle.lsh_sql import xxh64_doc_key_cte

HLL_P = 6
HLL_M = 1 << HLL_P  # 64 registers
RHO_CAP = 40
KMV_K = 32

_VBITS = 64 - HLL_P  # low bits feeding the rho count
_VMOD = 1 << _VBITS
_RHO_EMPTY = _VBITS + 1  # all-zero suffix
_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
_EST_NUM = _ALPHA * HLL_M * HLL_M * float(1 << RHO_CAP)
_LC_THRESHOLD = 2.5 * HLL_M
# linear-counting estimates for every possible zeros value (1..m):
# a shared literal table instead of ln() in two engines' libm.
_LC_TABLE = [HLL_M * math.log(HLL_M / z) for z in range(1, HLL_M + 1)]
_U32 = 1 << 32


def hll_registers(
    hashed: DataFrame, key_cols: list[str], h_col: str = "h"
) -> DataFrame:
    """(keys..., h) -> (keys..., bucket, reg): the mergeable HLL state.

    Registers merge across ANY partition of the input by max — the
    property every per-shard/per-snapshot sketch store relies on."""
    bucket = F.shiftrightunsigned(F.col(h_col), _VBITS)
    v = F.col(h_col).bitwiseAND(F.lit(_VMOD - 1))
    v2 = F.when(v == 0, F.lit(1)).otherwise(v)  # guard: lsb junk-safe
    lsb = v2.bitwiseAND(-v2)
    ntz_map = F.create_map(
        *[F.lit(x) for t in range(_VBITS) for x in (1 << t, t)]
    )
    rho = F.when(v == 0, F.lit(_RHO_EMPTY)).otherwise(
        F.element_at(ntz_map, lsb) + 1
    )
    return (
        hashed.select(*key_cols, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*key_cols, "bucket")
        .agg(F.max("rho").alias("reg"))
    )


def hll_estimate(regs: DataFrame, key_cols: list[str]) -> DataFrame:
    """(keys..., bucket, reg) ->
    (keys..., hll_zeros, hll_zsum, hll_est)."""
    term = F.expr(f"shiftleft(1L, int({RHO_CAP} - least(reg, {RHO_CAP})))")
    hll = regs.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("nb"), F.sum(term).alias("psum")
    )
    zeros = F.lit(HLL_M) - F.col("nb")
    zsum = F.col("psum") + zeros * F.lit(1 << RHO_CAP)
    est_raw = F.lit(_EST_NUM) / zsum.cast("double")
    lc_arr = F.array(*[F.lit(x) for x in _LC_TABLE])
    hll_est = F.round(
        F.when(
            (est_raw <= F.lit(_LC_THRESHOLD)) & (zeros > 0),
            F.element_at(lc_arr, zeros.cast("int")),
        ).otherwise(est_raw),
        6,
    )
    return hll.select(
        *key_cols,
        zeros.alias("hll_zeros"),
        zsum.alias("hll_zsum"),
        hll_est.alias("hll_est"),
    )


def cardinality_sketch(
    items: DataFrame, grp_col: str = "grp", url_col: str = "url"
) -> DataFrame:
    """items(grp, url) -> one row per group:

    (grp, n_exact, hll_zeros, hll_zsum, hll_est, kmv_kth, kmv_est)

    ``n_exact`` (exact distinct-hash count) is emitted for validation;
    a production run at 10^12 keys would drop it and keep only the
    sketch columns.  ``url`` values must be exactly 16 bytes (the
    oracle's pinned-XXH64 contract)."""
    h = F.xxhash64(F.col(url_col))
    # (grp, h) is 16 bytes/row and feeds both the HLL register path and
    # the KMV distinct: persist so the (arbitrarily wide) input scans
    # once
    hashed = items.select(
        F.col(grp_col).alias("grp"), h.alias("h")
    ).persist()

    # --- HyperLogLog register table (dup-insensitive: no distinct) ---
    regs = hll_registers(hashed, ["grp"])
    hll = hll_estimate(regs, ["grp"])

    # --- KMV bottom-k over DISTINCT hashes ---
    dh = hashed.distinct()
    hs = F.col("h").bitwiseXOR(F.lit(-(1 << 63)))  # signed order == unsigned
    # per-(grp, input-partition) prune: the global k-th smallest always
    # survives a local bottom-k, so the full-group sort sees only
    # k * n_partitions rows; the result is partition-invariant.
    local = Window.partitionBy("grp", "pid").orderBy(hs.asc())
    pruned = (
        dh.withColumn("pid", F.spark_partition_id())
        .withColumn("rn1", F.row_number().over(local))
        .filter(F.col("rn1") <= KMV_K)
    )
    per_grp = Window.partitionBy("grp").orderBy(hs.asc())
    nd = dh.groupBy("grp").agg(F.count(F.lit(1)).alias("n_exact"))
    kth = (
        pruned.withColumn("rn", F.row_number().over(per_grp))
        .filter(F.col("rn") == KMV_K)
        .select("grp", F.col("h").alias("kmv_kth"))
    )
    hi = F.shiftrightunsigned(F.col("kmv_kth"), 32).cast("double")
    lo = F.col("kmv_kth").bitwiseAND(F.lit(_U32 - 1)).cast("double")
    uv = hi * F.lit(float(_U32)) + lo
    kmv = nd.join(kth, "grp", "left").select(
        "grp",
        "n_exact",
        "kmv_kth",
        F.when(F.col("n_exact") < KMV_K, F.col("n_exact").cast("double"))
        .otherwise(
            F.round(F.lit(float((KMV_K - 1) * (1 << 64))) / uv, 6)
        )
        .alias("kmv_est"),
    )

    return kmv.join(hll, "grp").select(
        "grp",
        "n_exact",
        "hll_zeros",
        "hll_zsum",
        "hll_est",
        "kmv_kth",
        "kmv_est",
    )


def _ntz_case_sql(lsb: str) -> str:
    whens = " ".join(
        f"WHEN {1 << t} THEN {t}" for t in range(_VBITS)
    )
    return f"(CASE {lsb} {whens} END)"


def _lc_case_sql(zeros: str) -> str:
    whens = " ".join(
        f"WHEN {z} THEN {x!r}" for z, x in enumerate(_LC_TABLE, start=1)
    )
    return f"(CASE {zeros} {whens} END)"


def cardinality_sketch_sql(items_sql: str) -> str:
    """DuckDB twin of :func:`cardinality_sketch`.

    ``items_sql`` must SELECT (grp, url) with exactly-16-byte urls
    (the pinned-XXH64 contract)."""
    keys = xxh64_doc_key_cte("SELECT DISTINCT url FROM items")
    m64 = 1 << 64
    return f"""
WITH items AS ({items_sql}),
keys AS ({keys}),
hashed AS (
  SELECT i.grp, k.dk FROM items i JOIN keys k ON i.url = k.url
),
rhos AS (
  SELECT grp, dk // {_VMOD} AS bucket, dk % {_VMOD} AS v FROM hashed
),
rho2 AS (
  SELECT grp, bucket,
    CASE WHEN v = 0 THEN {_RHO_EMPTY}
         ELSE 1 + {_ntz_case_sql("(v2 - (v2 & (v2 - 1)))")}
    END AS rho
  FROM (SELECT grp, bucket, v,
               CASE WHEN v = 0 THEN 1 ELSE v END AS v2 FROM rhos)
),
regs AS (
  SELECT grp, bucket, max(rho) AS reg FROM rho2 GROUP BY grp, bucket
),
hll AS (
  SELECT grp, count(*) AS nb,
         sum(1::BIGINT << ({RHO_CAP} - least(reg, {RHO_CAP})))::BIGINT
           AS psum
  FROM regs GROUP BY grp
),
hll2 AS (
  SELECT grp, ({HLL_M} - nb)::BIGINT AS hll_zeros,
         (psum + ({HLL_M} - nb) * {1 << RHO_CAP})::BIGINT AS hll_zsum
  FROM hll
),
hll3 AS (
  SELECT grp, hll_zeros, hll_zsum,
    round(CASE WHEN ({_EST_NUM!r} / hll_zsum) <= {_LC_THRESHOLD!r}
                AND hll_zeros > 0
               THEN {_lc_case_sql("hll_zeros")}
               ELSE {_EST_NUM!r} / hll_zsum END, 6) AS hll_est
  FROM hll2
),
hd AS (SELECT DISTINCT grp, dk FROM hashed),
kd AS (
  SELECT grp, dk, row_number() OVER (PARTITION BY grp ORDER BY dk) AS rn
  FROM hd
),
nds AS (SELECT grp, count(*) AS n_exact FROM hd GROUP BY grp),
kth AS (
  SELECT grp,
    CASE WHEN dk >= {1 << 63}
         THEN (dk::HUGEINT - {m64})::BIGINT ELSE dk::BIGINT END AS kmv_kth,
    (CAST(dk // {_U32} AS DOUBLE) * {float(_U32)!r}
       + CAST(dk % {_U32} AS DOUBLE)) AS uv
  FROM kd WHERE rn = {KMV_K}
),
kmv AS (
  SELECT n.grp, n.n_exact, k.kmv_kth,
    CASE WHEN n.n_exact < {KMV_K} THEN CAST(n.n_exact AS DOUBLE)
         ELSE round({float((KMV_K - 1) * (1 << 64))!r} / k.uv, 6)
    END AS kmv_est
  FROM nds n LEFT JOIN kth k ON n.grp = k.grp
)
SELECT v.grp, v.n_exact, h.hll_zeros, h.hll_zsum, h.hll_est,
       v.kmv_kth, v.kmv_est
FROM kmv v JOIN hll3 h ON v.grp = h.grp
"""


def hll_union_sketch(
    items: DataFrame,
    snap_col: str = "snapshot",
    grp_col: str = "grp",
    url_col: str = "url",
) -> DataFrame:
    """Mergeable-sketch union across snapshots (E92).

    The point of sketching at 10^12 docs: per-snapshot register tables
    are tiny, live in the metadata store, and the UNION cardinality of
    any snapshot subset is answered by a register-wise max — the raw
    url streams are never re-read or re-shuffled.  This operator
    computes the per-(snapshot, grp) registers AS IF stored per shard,
    merges them by max, and emits the union estimate next to the
    dedup-evidence numbers:

    (grp, n_snapshots, union_exact, parts_exact_sum,
     hll_zeros, hll_zsum, hll_est)

    ``parts_exact_sum - union_exact`` is the cross-snapshot overlap the
    sketch lets you see without a giant distinct (both exact columns
    are validation-only; production keeps the sketch columns)."""
    h = F.xxhash64(F.col(url_col))
    hashed = items.select(
        F.col(snap_col).alias("snap"),
        F.col(grp_col).alias("grp"),
        h.alias("h"),
    ).persist()
    per_snap_regs = hll_registers(hashed, ["snap", "grp"])
    merged = per_snap_regs.groupBy("grp", "bucket").agg(
        F.max("reg").alias("reg")
    )
    est = hll_estimate(merged, ["grp"])
    union_exact = (
        hashed.select("grp", "h")
        .distinct()
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("union_exact"))
    )
    parts = (
        hashed.distinct()
        .groupBy("snap", "grp")
        .agg(F.count(F.lit(1)).alias("pe"))
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n_snapshots"),
            F.sum("pe").alias("parts_exact_sum"),
        )
    )
    return (
        parts.join(union_exact, "grp")
        .join(est, "grp")
        .select(
            "grp",
            "n_snapshots",
            "union_exact",
            "parts_exact_sum",
            "hll_zeros",
            "hll_zsum",
            "hll_est",
        )
    )


def hll_union_sketch_sql(items_sql: str) -> str:
    """DuckDB twin of :func:`hll_union_sketch`.  ``items_sql`` SELECTs
    (snapshot, grp, url) with 16-byte urls."""
    keys = xxh64_doc_key_cte("SELECT DISTINCT url FROM uitems")
    return f"""
WITH uitems AS ({items_sql}),
keys AS MATERIALIZED ({keys}),
hashed AS (
  SELECT i.snapshot AS snap, i.grp, k.dk
  FROM uitems i JOIN keys k ON i.url = k.url
),
rhos AS (
  SELECT snap, grp, dk // {_VMOD} AS bucket, dk % {_VMOD} AS v
  FROM hashed
),
rho2 AS (
  SELECT snap, grp, bucket,
    CASE WHEN v = 0 THEN {_RHO_EMPTY}
         ELSE 1 + {_ntz_case_sql("(v2 - (v2 & (v2 - 1)))")}
    END AS rho
  FROM (SELECT snap, grp, bucket, v,
               CASE WHEN v = 0 THEN 1 ELSE v END AS v2 FROM rhos)
),
snap_regs AS (
  SELECT snap, grp, bucket, max(rho) AS reg
  FROM rho2 GROUP BY snap, grp, bucket
),
merged AS (
  SELECT grp, bucket, max(reg) AS reg FROM snap_regs GROUP BY grp, bucket
),
hll AS (
  SELECT grp, count(*) AS nb,
         sum(1::BIGINT << ({RHO_CAP} - least(reg, {RHO_CAP})))::BIGINT
           AS psum
  FROM merged GROUP BY grp
),
hll2 AS (
  SELECT grp, ({HLL_M} - nb)::BIGINT AS hll_zeros,
         (psum + ({HLL_M} - nb) * {1 << RHO_CAP})::BIGINT AS hll_zsum
  FROM hll
),
hll3 AS (
  SELECT grp, hll_zeros, hll_zsum,
    round(CASE WHEN ({_EST_NUM!r} / hll_zsum) <= {_LC_THRESHOLD!r}
                AND hll_zeros > 0
               THEN {_lc_case_sql("hll_zeros")}
               ELSE {_EST_NUM!r} / hll_zsum END, 6) AS hll_est
  FROM hll2
),
ue AS (
  SELECT grp, count(*)::BIGINT AS union_exact
  FROM (SELECT DISTINCT grp, dk FROM hashed) GROUP BY grp
),
parts AS (
  SELECT grp, count(*)::BIGINT AS n_snapshots,
         sum(pe)::BIGINT AS parts_exact_sum
  FROM (
    SELECT snap, grp, count(*)::BIGINT AS pe
    FROM (SELECT DISTINCT snap, grp, dk FROM hashed)
    GROUP BY snap, grp
  ) GROUP BY grp
)
SELECT p.grp, p.n_snapshots, u.union_exact, p.parts_exact_sum,
       h.hll_zeros, h.hll_zsum, h.hll_est
FROM parts p JOIN ue u USING (grp) JOIN hll3 h USING (grp)
"""
