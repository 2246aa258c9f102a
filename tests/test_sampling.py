"""E141 deterministic stratified sampling: rate behavior, exact-n
guarantees, growth stability (the property rand() can't give),
partition invariance, and the DuckDB twin."""

from __future__ import annotations

import hashlib

import pytest

from mediaduplicatefinder_spark.operators.sampling import (
    DENOM,
    stratified_sample_exact,
    stratified_sample_fraction,
    stratified_sample_report,
    stratified_sample_sql,
)

LANGS = ["en", "de", "zh", "fr"]


def _h60(key: str) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[:15], 16)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, LANGS[i % 4]) for i in range(2000)]
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_fraction_matches_reference_and_rate(spark, docs):
    rates = {"en": 0.2, "de": 0.5}
    got = stratified_sample_fraction(docs, "lang", rates).collect()
    for r in got:
        want = _h60(str(r["doc_id"])) % DENOM < int(
            rates.get(r["lang"], 0.0) * DENOM
        )
        assert r["kept"] == want
    kept_en = sum(1 for r in got if r["lang"] == "en" and r["kept"])
    kept_fr = sum(1 for r in got if r["lang"] == "fr" and r["kept"])
    # 500 docs per stratum at rate 0.2: binomial mean 100, generous band
    assert 60 <= kept_en <= 140
    assert kept_fr == 0  # default rate


def test_fraction_stable_under_growth(spark, docs):
    """Rows kept from the small corpus are exactly the same rows kept
    from the doubled corpus — resume/idempotency."""
    rates = {"en": 0.3, "de": 0.3, "zh": 0.3, "fr": 0.3}
    small = {
        r["doc_id"]
        for r in stratified_sample_fraction(docs, "lang", rates).collect()
        if r["kept"]
    }
    grown = docs.union(
        docs.sparkSession.createDataFrame(
            [(i, LANGS[i % 4]) for i in range(2000, 4000)],
            "doc_id long, lang string",
        )
    )
    big = {
        r["doc_id"]
        for r in stratified_sample_fraction(grown, "lang", rates).collect()
        if r["kept"]
    }
    assert small == {d for d in big if d < 2000}


def test_exact_n_counts_and_min_hash(spark, docs):
    counts = {"en": 7, "de": 3, "zh": 9999}
    got = stratified_sample_exact(docs, "lang", counts).collect()
    by_lang = {}
    for r in got:
        by_lang.setdefault(r["lang"], []).append(r)
    assert len(by_lang["en"]) == 7
    assert len(by_lang["de"]) == 3
    assert len(by_lang["zh"]) == 500  # n exceeds stratum -> take all
    assert "fr" not in by_lang  # default 0
    # the picks ARE the min-hash rows
    en_all = sorted(
        (_h60(str(i)), i) for i in range(2000) if LANGS[i % 4] == "en"
    )
    assert {r["doc_id"] for r in by_lang["en"]} == {i for _, i in en_all[:7]}
    assert sorted(r["rk"] for r in by_lang["en"]) == list(range(1, 8))


def test_report_combines_both(spark, docs):
    rep = stratified_sample_report(
        docs, "lang", {"en": 0.2}, {"de": 5}
    ).collect()
    assert len(rep) == 2000  # unfiltered audit relation
    assert sum(1 for r in rep if r["exact_rk"] is not None) == 5
    assert all(r["lang"] == "de" for r in rep if r["exact_rk"] is not None)


def test_partition_invariance(spark, docs):
    rates, counts = {"en": 0.2, "zh": 0.4}, {"de": 6, "fr": 2}
    a = stratified_sample_report(docs, "lang", rates, counts).collect()
    b = stratified_sample_report(
        docs.repartition(13), "lang", rates, counts
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_sql_twin_parity(spark, docs, tmp_path):
    import duckdb

    p = str(tmp_path / "docs.parquet")
    docs.write.mode("overwrite").parquet(p)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM parquet_scan('{p}/*.parquet')"
    )
    rates, counts = {"en": 0.15, "de": 0.6}, {"zh": 4, "en": 11}
    want = sorted(
        map(
            tuple,
            con.execute(stratified_sample_sql(rates, counts)).fetchall(),
        )
    )
    got = sorted(
        map(
            tuple,
            stratified_sample_report(docs, "lang", rates, counts).collect(),
        )
    )
    assert got == want
