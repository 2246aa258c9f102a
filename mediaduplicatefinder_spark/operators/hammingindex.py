"""Guaranteed-complete Hamming-ball pair search over 64-bit
fingerprints (E171): the Manku–Jain–Sarma multi-table construction
("Detecting Near-Duplicates for Web Crawling", WWW'07, §3).

Why the existing SimHash band channel is not enough at 10^12 docs:
``candidates._simhash_bands`` splits the fingerprint into 16-bit
chunks (4 tables).  A 16-bit key has 65,536 distinct values — at
10^12 fingerprints that is ~15M rows per bucket, so the band
self-join degenerates into a skew catastrophe long before the pair
filter runs (the engine survives today only because buckets are
capped, which *drops* candidates).  Manku's fix: split the 64 bits
into B blocks and build one table per (B−k)-subset of blocks, keyed
on the CONCATENATION of the chosen blocks.  The key is now
(B−k)·(64/B) bits wide (32 bits at B=6, k=3; 40 bits at B=8, k=3),
so expected bucket size at 10^12 docs falls from 15M to ~250 / ~1k —
and by pigeonhole the union of tables is COMPLETE: any pair differing
in ≤ k bits leaves ≥ B−k blocks untouched, hence agrees on at least
one chosen subset.  Completeness is exact, not probabilistic — unlike
LSH banding there is no recall parameter to tune.

Relation to the reference: this is the scale-true form of the P4
fingerprint decision (main_cli.cpp:221-242) — the reference compares
every same-type pair's 64-bit hashes by popcount(XOR) ≤ threshold
(main_cli.cpp:211-219); this operator produces exactly the pairs that
decision would accept at radius k without enumerating O(n²).

Spark shape:

- Table replication is map-side: one ``posexplode`` of a per-row
  array of C(B, B−k) packed keys — no shuffle until the single
  equi-join on (group, table_id, key).  All expressions are JVM
  bit-ops (shiftrightunsigned / AND / OR); no Python in the path.
- The self-join is an equi hash join on a (table_id, key) composite;
  AQE handles residual skew (a hot template fingerprint concentrates
  in ONE bucket per table, bounded by the duplicate family size, not
  by the key-space coarseness).
- Verification ``bit_count(a XOR b) <= k`` runs map-side on the join
  output before the pair-dedup shuffle, so false candidates (same
  key, distance > k) never ride the exchange.
- Output pairs are canonicalized (id_a < id_b) and deduped — a pair
  within radius k typically agrees on several subsets.

The DuckDB twin is the naive brute force: all same-group pairs with
``bit_count(xor(h_a, h_b)) <= k`` — value equality proves both the
pigeonhole completeness (no missing pair) and soundness (no extra).
"""

from __future__ import annotations

from itertools import combinations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _block_widths(bits: int, n_blocks: int) -> list[int]:
    """Split ``bits`` into n_blocks contiguous widths, remainder
    spread over the leading blocks (Manku splits 64 unevenly too)."""
    base, rem = divmod(bits, n_blocks)
    return [base + (1 if i < rem else 0) for i in range(n_blocks)]


def _packed_key(h: Column, combo: tuple[int, ...], offs: list[int],
                widths: list[int]) -> Column:
    """Concatenate the chosen blocks of ``h`` into one long key."""
    key = F.lit(0).cast("long")
    shift = 0
    for b in combo:
        block = F.shiftrightunsigned(h, offs[b])
        if widths[b] < 64:  # full-width block needs (and fits) no mask
            block = block.bitwiseAND(F.lit((1 << widths[b]) - 1))
        key = key.bitwiseOR(F.shiftleft(block, shift))
        shift += widths[b]
    return key


def hamming_complete_pairs(
    df: DataFrame,
    id_col: str = "url",
    hash_col: str = "h64",
    group_cols: tuple[str, ...] = ("lang",),
    k: int = 3,
    n_blocks: int = 6,
    bits: int = 64,
) -> DataFrame:
    """All same-group pairs with Hamming(hash_a, hash_b) <= k,
    complete by pigeonhole over C(n_blocks, n_blocks-k) key tables.

    Returns (group_cols..., id_a, id_b, hamming) with id_a < id_b,
    one row per pair.  Requires n_blocks > k (else no table has a
    non-empty key).  The packed key always fits one long: a combo
    selects disjoint blocks of a 64-bit word, so ≤ 64 key bits total,
    and the packing is a bijection (equality on the key == equality
    on every chosen block) regardless of sign wrap.
    """
    if not 0 <= k < n_blocks:
        raise ValueError(f"need 0 <= k < n_blocks, got k={k} B={n_blocks}")
    widths = _block_widths(bits, n_blocks)
    offs = [sum(widths[:i]) for i in range(n_blocks)]
    combos = list(combinations(range(n_blocks), n_blocks - k))

    h = F.col(hash_col)
    keys = F.array(
        *[_packed_key(h, c, offs, widths) for c in combos]
    )
    gcols = list(group_cols)
    tabled = df.select(
        *gcols,
        F.col(id_col).alias("__id"),
        h.alias("__h"),
        F.posexplode(keys).alias("__t", "__key"),
    )

    right = tabled.select(
        *[F.col(g).alias(f"{g}__r") for g in gcols],
        F.col("__id").alias("__id_r"),
        F.col("__h").alias("__h_r"),
        F.col("__t").alias("__t_r"),
        F.col("__key").alias("__key_r"),
    )
    cond = (F.col("__t") == F.col("__t_r")) & (
        F.col("__key") == F.col("__key_r")
    ) & (F.col("__id") < F.col("__id_r"))
    for g in gcols:
        cond = cond & (F.col(g) == F.col(f"{g}__r"))

    ham = F.bit_count(F.col("__h").bitwiseXOR(F.col("__h_r")))
    return (
        tabled.join(right, cond)
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= F.lit(k))
        .select(
            *gcols,
            F.col("__id").alias(f"{id_col}_a"),
            F.col("__id_r").alias(f"{id_col}_b"),
            "hamming",
        )
        .dropDuplicates(gcols + [f"{id_col}_a", f"{id_col}_b"])
    )
