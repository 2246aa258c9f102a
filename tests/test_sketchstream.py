"""E94 streaming HLL maintenance (streaming/sketchstream.py)."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from mediaduplicatefinder_spark.operators.sketches import (
    hll_estimate,
    hll_registers,
)
from mediaduplicatefinder_spark.streaming.sketchstream import (
    streaming_hll_registers,
)

SCHEMA = "grp string, url string"


def _write(rows, d, name):
    pdf = pd.DataFrame(rows, columns=["grp", "url"])
    pq.write_table(
        pa.Table.from_pandas(
            pdf,
            schema=pa.schema([("grp", pa.string()), ("url", pa.string())]),
            preserve_index=False,
        ),
        f"{d}/{name}",
    )


def _urls(lo, hi):
    return ["doc://%010d" % k for k in range(lo, hi)]


def _run_stream(spark, inp, ck, qname):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(inp)
    )
    q = (
        streaming_hll_registers(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(qname)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _batch_regs(spark, rows):
    from pyspark.sql import functions as F

    df = spark.createDataFrame(rows, SCHEMA)
    hashed = df.select("grp", F.xxhash64("url").alias("h"))
    return {
        (r.grp, r.bucket): r.reg
        for r in hll_registers(hashed, ["grp"]).collect()
    }


@pytest.fixture
def dirs(tmp_path):
    inp = tmp_path / "in"
    inp.mkdir()
    return str(inp), str(tmp_path / "ck")


def test_streaming_registers_match_batch(spark, dirs):
    inp, ck = dirs
    b1 = [("g", u) for u in _urls(0, 300)]
    _write(b1, inp, "b1.parquet")
    _run_stream(spark, inp, ck, "hllregs1")
    got1 = {
        (r.grp, r.bucket): r.reg
        for r in spark.table("hllregs1").collect()
    }
    assert got1 == _batch_regs(spark, b1)

    # batch 2: replays half of batch 1 (max-merge must absorb it) and
    # adds a new group; RESTART from the checkpoint
    b2 = [("g", u) for u in _urls(150, 450)] + [
        ("h", u) for u in _urls(0, 40)
    ]
    _write(b2, inp, "b2.parquet")
    _run_stream(spark, inp, ck, "hllregs2")
    got2 = {
        (r.grp, r.bucket): r.reg
        for r in spark.table("hllregs2").collect()
    }
    assert got2 == _batch_regs(spark, b1 + b2)

    # estimates from the streamed registers == batch estimates
    est = {
        r.grp: r.hll_est
        for r in hll_estimate(spark.table("hllregs2"), ["grp"]).collect()
    }
    assert abs(est["g"] - 450) / 450 < 0.52
    assert est["h"] > 0
    # state is register-bounded: never more than m rows per group
    from collections import Counter

    per_grp = Counter(g for g, _ in got2)
    assert max(per_grp.values()) <= 64


# ------------------------------------------------------------- E135 CMS


def _run_cms_stream(spark, inp, ck, qname):
    from mediaduplicatefinder_spark.streaming.sketchstream import (
        streaming_cms_grid,
    )

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(inp)
    )
    q = (
        streaming_cms_grid(stream, item_col="url")
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName(qname)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def _batch_grid(spark, rows):
    from mediaduplicatefinder_spark.operators.cms import cms_build

    df = spark.createDataFrame(rows, SCHEMA)
    return {
        (r.grp, r.j, r.col): r.cnt
        for r in cms_build(df, item_col="url", group_cols=["grp"]).collect()
    }


def test_streaming_cms_matches_batch_across_restart(spark, dirs):
    inp, ck = dirs
    b1 = [("g", "doc://%06d" % (k % 23)) for k in range(200)]
    _write(b1, inp, "c1.parquet")
    _run_cms_stream(spark, inp, ck, "cmsgrid1")
    got1 = {
        (r.grp, r.j, r.col): r.cnt
        for r in spark.table("cmsgrid1").collect()
    }
    assert got1 == _batch_grid(spark, b1)

    # second batch lands; the RESTARTED query (same checkpoint) must
    # resume from state, not reprocess b1 (sum is not idempotent — this
    # pins the file source's exactly-once offset tracking)
    b2 = [("g", "doc://%06d" % (k % 31)) for k in range(100)] + [
        ("h", "doc://x")
    ]
    _write(b2, inp, "c2.parquet")
    _run_cms_stream(spark, inp, ck, "cmsgrid2")
    got2 = {
        (r.grp, r.j, r.col): r.cnt
        for r in spark.table("cmsgrid2").collect()
    }
    assert got2 == _batch_grid(spark, b1 + b2)
    # state bound: at most d*w cells per group
    from mediaduplicatefinder_spark.operators.cms import CMS_D, CMS_W

    per_grp: dict = {}
    for (g, _, _), _c in got2.items():
        per_grp[g] = per_grp.get(g, 0) + 1
    assert all(n <= CMS_D * CMS_W for n in per_grp.values())
