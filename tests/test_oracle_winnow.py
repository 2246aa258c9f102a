"""The winnow_fingerprints DuckDB oracle (in __spark_entry__.oracle_sql)
re-derives the polynomial rolling hash + rightmost-window-min in pure
SQL. These tests pin (a) the ASCII invariant the SQL's unicode()==byte
equivalence relies on, and (b) SQL-vs-python-spec parity on adversarial
texts, including both window branches (nh <= 16 single-min and the
windowed path) — no Spark session needed."""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod
from mediaduplicatefinder_spark.functions import winnow

SF_DIRS = [
    d
    for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01")
    if os.path.exists(os.path.join(d, "documents.parquet"))
]


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_documents_corpus_is_ascii(sf_dir):
    """unicode(char) == utf-8 byte and the SQL [^a-zA-Z0-9] strip ==
    python isalnum() only hold for ASCII text; the driver corpus is."""
    con = duckdb.connect()
    (n_bad,) = con.execute(
        "SELECT count(*) FROM read_parquet(?) "
        "WHERE regexp_matches(text, '[^\\x00-\\x7F]')",
        [os.path.join(sf_dir, "documents.parquet")],
    ).fetchone()
    assert n_bad == 0


def _oracle_fingerprints(texts: list[str]) -> dict[int, set[int]]:
    sql = entrymod.oracle_sql()["winnow_fingerprints"]
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}),
    )
    out: dict[int, set[int]] = {}
    for doc_id, fp in con.execute(sql).fetchall():
        out.setdefault(doc_id, set()).add(fp)
    return out


def test_winnow_oracle_matches_python_spec():
    texts = [
        "",  # no k-grams -> absent from oracle output
        "abc",  # norm length < k
        "ab-cd ef!",  # norm length 6 < k after stripping
        "abcdefgh",  # exactly one k-gram (nh=1, small branch)
        "A" * 23 + "!!!",  # nh = 16 boundary: single rightmost min
        "A" * 24,  # nh = 17: first windowed doc
        "The Quick, Brown FOX!! jumps over 12345 lazy dogs " * 4,
        "zzzzzzzzzzzzzzzzzzzzzzzzzzzzzzzz",  # all-equal hashes (tie rule)
        "abcdefgh" * 10,  # periodic text, repeated hash values
    ]
    got = _oracle_fingerprints(texts)
    for i, t in enumerate(texts):
        expect = set(
            winnow.winnow_fingerprints(winnow.normalize_for_winnow(t)).tolist()
        )
        assert got.get(i, set()) == expect, f"doc {i}: {t[:30]!r}"
