"""E145 JSONL corrupt-channel parsing: field extraction, every corrupt
shape routes to the flag (never an exception), escapes, schema
projection, and partition invariance."""

from __future__ import annotations

import json

import pytest

from mediaduplicatefinder_spark.operators.jsonl import JSONL_SCHEMA, parse_jsonl


@pytest.fixture(scope="module")
def lines(spark):
    rows = [
        (0, json.dumps({"url": "http://a/x", "lang": "en", "n": 7})),
        (1, '{"url": "http://b/y", "lang": "de", "n": 9}'),
        (2, '{"url": "http://c'),  # truncated mid-string
        (3, "not json at all"),
        (4, '{"url": "http://d/z", "lang": "fr"'),  # unbalanced brace
        (5, ""),  # empty line
        (6, None),  # null line
        (7, '{"lang": "es", "extra": 1}'),  # missing fields parse as NULL
        (8, json.dumps({"url": 'http://e/"q"', "lang": "zh", "n": 0})),  # escapes
    ]
    return spark.createDataFrame(rows, "doc_id long, line string")


def test_channels(spark, lines):
    got = {r["doc_id"]: r for r in parse_jsonl(lines).collect()}
    assert len(got) == 9  # no row lost, no exception
    for i in (0, 1, 7, 8):
        assert not got[i]["corrupt"]
    for i in (2, 3, 4, 5, 6):
        assert got[i]["corrupt"]
        assert got[i]["url"] is None and got[i]["lang"] is None
    assert got[0]["url"] == "http://a/x" and got[0]["n"] == 7
    assert got[7]["url"] is None and got[7]["lang"] == "es"  # partial schema
    assert got[8]["url"] == 'http://e/"q"'  # escape round-trip
    # raw line preserved for forensics on the corrupt channel
    assert got[3]["line"] == "not json at all"


def test_schema_projection(spark, lines):
    out = parse_jsonl(lines, schema="n bigint")
    assert set(out.columns) == {"doc_id", "line", "n", "corrupt"}
    got = {r["doc_id"]: r for r in out.collect()}
    assert got[0]["n"] == 7 and got[0]["corrupt"] is False


def test_partition_invariance(spark, lines):
    a = parse_jsonl(lines).collect()
    b = parse_jsonl(lines.repartition(4)).collect()
    assert sorted(map(tuple, a), key=str) == sorted(map(tuple, b), key=str)
