"""E87 sorted-neighborhood candidates (operators/sortedneighborhood.py)."""

from __future__ import annotations

import re

from mediaduplicatefinder_spark.operators.sortedneighborhood import (
    SNM_KEY_LEN,
    SNM_MIN_COMMON,
    SNM_SIZE_RATIO,
    SNM_WINDOW,
    sorted_neighborhood_pairs,
)


def _key(text):
    return re.sub(r"[^a-z0-9]+", "", text.lower())[:SNM_KEY_LEN]


def _naive(texts, window=SNM_WINDOW, min_common=SNM_MIN_COMMON):
    rows = [
        (i, _key(t), len(t)) for i, t in enumerate(texts) if _key(t)
    ]
    rows.sort(key=lambda r: (r[1], r[0]))
    out = set()
    for i, (da, ka, na) in enumerate(rows):
        for j in range(i + 1, min(i + window, len(rows))):
            db, kb, nb = rows[j]
            common = 0
            for x in range(1, min(len(ka), len(kb)) + 1):
                if ka[:x] == kb[:x]:
                    common += 1
            if common >= min_common and min(na, nb) / max(
                na, nb
            ) >= SNM_SIZE_RATIO:
                out.add((da, db, common))
    return out


def _texts():
    base = "syndicated headline about spark engines item"
    texts = []
    for i in range(120):
        if i % 3 == 0:
            texts.append(f"{base} {i} trailing words vary here {i * 7}")
        else:
            texts.append(f"document number {i} with its own opening {i}")
    texts.append("")  # empty: dropped
    texts.append("!!! ???")  # normalizes to empty: dropped
    return texts


def test_matches_naive_reference(spark):
    texts = _texts()
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        (r.doc_a, r.doc_b, r.common_prefix)
        for r in sorted_neighborhood_pairs(df).collect()
    }
    assert got == _naive(texts)
    assert got  # non-empty: the prefix family pairs


def test_partition_invariance(spark):
    texts = _texts()
    want = _naive(texts)
    for nparts in (1, 3, 7):
        df = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        ).repartition(nparts)
        got = {
            (r.doc_a, r.doc_b, r.common_prefix)
            for r in sorted_neighborhood_pairs(df).collect()
        }
        assert got == want, nparts


def test_window_bound(spark):
    # 10 identical-key docs, window 4 -> each doc pairs with <= 3
    texts = [f"identical twenty char prefix here doc {i}" for i in range(10)]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    rows = sorted_neighborhood_pairs(df).collect()
    from collections import Counter

    cnt = Counter(r.doc_a for r in rows)
    assert max(cnt.values()) <= SNM_WINDOW - 1
    assert len(rows) == 3 * 10 - (1 + 2 + 3)  # arithmetic of a chain


def test_min_common_gate(spark):
    texts = ["alpha bravo charlie delta", "zulu yankee xray whiskey"]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    assert sorted_neighborhood_pairs(df).collect() == []
