"""Sequence packing layout (operators/packing.py, E48)."""

from __future__ import annotations

from mediaduplicatefinder_spark.operators.packing import pack_sequences


def _run(spark, rows, window=10, parallelism=None):
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    if parallelism:
        df = df.repartition(parallelism)
    return {r.doc_id: r for r in pack_sequences(df, window=window).collect()}


def test_offsets_and_window_assignment(spark):
    # costs: 3+1=4, 2+1=3, 5+1=6 -> offsets 0, 4, 7 (window 10)
    rows = [
        (1, "a b c"),
        (2, "d e"),
        (3, "f g h i j"),
    ]
    got = _run(spark, rows, window=10)
    assert (got[1].offset, got[1].seq_start, got[1].seq_end) == (0, 0, 0)
    assert (got[2].offset, got[2].seq_start, got[2].seq_end) == (4, 0, 0)
    # doc 3 occupies slots 7..12 -> spans windows 0 and 1
    assert (got[3].offset, got[3].seq_start, got[3].seq_end) == (7, 0, 1)
    assert got[3].n_seqs == 2


def test_empty_doc_costs_one_eos(spark):
    rows = [(1, ""), (2, "   "), (3, "w")]
    got = _run(spark, rows, window=10)
    assert got[1].n_tokens == 0 and got[1].cost == 1 and got[1].offset == 0
    assert got[2].offset == 1  # the empty doc's EOS occupied a slot
    assert got[3].offset == 2


def test_exact_window_boundary(spark):
    # cost exactly = window: doc fills window 0 completely; next starts 1
    rows = [(1, " ".join(["t"] * 9)), (2, "x")]
    got = _run(spark, rows, window=10)
    assert (got[1].seq_start, got[1].seq_end) == (0, 0)
    assert got[2].offset == 10 and got[2].seq_start == 1


def test_duplicate_doc_ids_rows_frame(spark):
    # duplicate doc_id values: the local prefix-sum window must use a
    # ROWS frame — the default RANGE frame sums all ORDER BY peers'
    # costs, giving every duplicate the same (wrong) exclusive prefix
    rows = [(1, "a b"), (1, "c d"), (1, "e f"), (2, "g")]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    out = pack_sequences(df, window=100).collect()
    offsets = sorted(r.offset for r in out)
    # costs are 3,3,3,1 -> exclusive prefixes must tile: 0,3,6,9
    assert offsets == [0, 3, 6, 9]


def test_partition_invariance_and_order(spark):
    rows = [(i, " ".join(["w"] * (i % 7 + 1))) for i in range(60)]
    a = _run(spark, rows, window=16, parallelism=3)
    b = _run(spark, rows, window=16, parallelism=13)
    assert {k: tuple(v) for k, v in a.items()} == {
        k: tuple(v) for k, v in b.items()
    }
    # offsets are a packed permutation: sorted by doc_id they tile the
    # stream with no gaps or overlaps
    acc = 0
    for i in range(60):
        assert a[i].offset == acc
        acc += a[i].cost


def test_no_global_single_partition_window(spark):
    df = spark.createDataFrame(
        [(i, "a b") for i in range(10)], "doc_id: long, text: string"
    )
    plan = (
        pack_sequences(df)._jdf.queryExecution().executedPlan().toString()
    )
    # the only Exchange allowed is the rangepartitioning one; a naive
    # global window would show SinglePartition
    assert "SinglePartition" not in plan


# -------------------------------- E66 deterministic shuffle + shards


def test_shard_layout_contiguous_and_deterministic(spark):
    from mediaduplicatefinder_spark.operators.packing import shard_layout

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * (5 + i % 7))) for i in range(200)],
        "doc_id long, text string",
    )
    rows = shard_layout(docs, shard_tokens=64).collect()
    assert len(rows) == 200
    # offsets tile the stream exactly: sorted offsets == exclusive
    # prefix sums of costs in shuffle order
    ordered = sorted(rows, key=lambda r: (r.shuffle_key, r.doc_id))
    acc = 0
    for r in ordered:
        assert r.offset == acc
        assert r.shard_id == acc // 64 and r.shard_pos == acc % 64
        acc += r.cost
    # re-run is byte-identical (no rand, no zipWithIndex)
    rows2 = shard_layout(docs, shard_tokens=64).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rows2))


def test_shard_layout_parallelism_invariance(spark):
    # the two-phase prefix sum must not depend on partition count
    from mediaduplicatefinder_spark.operators.packing import shard_layout

    docs = spark.createDataFrame(
        [(i, " ".join(["x"] * (1 + i % 11))) for i in range(150)],
        "doc_id long, text string",
    )
    a = sorted(map(tuple, shard_layout(docs.coalesce(1)).collect()))
    b = sorted(map(tuple, shard_layout(docs.repartition(13)).collect()))
    assert a == b


def test_shard_layout_shuffles(spark):
    # the shuffle order must differ from doc_id order (that is the
    # point) while remaining a permutation
    from mediaduplicatefinder_spark.operators.packing import shard_layout

    docs = spark.createDataFrame(
        [(i, "a b c") for i in range(100)], "doc_id long, text string"
    )
    rows = shard_layout(docs).collect()
    by_offset = [r.doc_id for r in sorted(rows, key=lambda r: r.offset)]
    assert by_offset != sorted(by_offset)  # not crawl order
    assert sorted(by_offset) == list(range(100))  # a permutation
