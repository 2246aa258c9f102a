"""Rendezvous (highest-random-weight) sharding (E138) — stable
doc -> shard assignment under resharding (Thaler & Ravishankar, IEEE
ToN 1998; the scheme consistent-hashing replaced with rings, still the
simplest one with the minimal-disruption property).

Why the engine needs it: the incremental store (incremental.py), the
shard layout writer (E73), and any bucketed signature table key docs
to a fixed shard set; growing that set with modulo hashing reshuffles
EVERYTHING (every doc's ``h % n`` changes), while rendezvous moves
EXACTLY the docs the new shard wins — 1/(n+1) in expectation, nothing
else (pinned by test as an exact set property, not a statistic).

Assignment: ``shard(d) = argmax_s H(s, d)`` — each doc independently
ranks all shards by a per-(shard, doc) hash and takes the max; ties
broken by shard name (the md5-60bit hash makes them ~impossible, but
the order is pinned anyway). Map-only: a literal array of per-shard
structs, ``array_max`` picks the winner; no shuffle, no state, and two
engines agree hash-for-hash (the cross-engine md5-60bit idiom).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _weight(shard: str, key: Column) -> Column:
    return F.conv(
        F.substring(
            F.md5(F.concat_ws("|", F.lit(shard), key)), 1, 15
        ),
        16, 10,
    ).cast("long")


def rendezvous_shard(key: Column, shards: list[str]) -> Column:
    """Column expression: the winning shard name for ``key``."""
    if not shards:
        raise ValueError("shards must be non-empty")
    ranked = F.array_max(
        F.array(
            *[
                F.struct(
                    _weight(s, key).alias("w"), F.lit(s).alias("s")
                )
                for s in sorted(shards)
            ]
        )
    )
    return ranked.getField("s")


def assign_shards(
    df: DataFrame, shards: list[str], key_col: str = "doc_id"
) -> DataFrame:
    """df + ``shard`` column (key stringified for hashing)."""
    return df.withColumn(
        "shard",
        rendezvous_shard(F.col(key_col).cast("string"), shards),
    )


def rendezvous_sql(
    shards: list[str],
    source: str = "SELECT doc_id FROM documents",
    key_expr: str = "doc_id::VARCHAR",
) -> str:
    """DuckDB twin: same argmax over the same per-(shard, key) hashes."""
    if not shards:
        raise ValueError("shards must be non-empty")
    weights = ", ".join(
        "{'w': ('0x' || substr(md5('%s|' || %s), 1, 15))::BIGINT, "
        "'s': '%s'}" % (s, key_expr, s)
        for s in sorted(shards)
    )
    return f"""
SELECT *, list_max([{weights}]).s AS shard
FROM ({source})
"""
