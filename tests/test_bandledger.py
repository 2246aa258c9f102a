"""Persisted bucketed band ledger (the E20/E170 production layout):
probing a bucketed-by-(band,bh) ledger table must return EXACTLY the
in-plan cross-corpus candidates, and the bucketed scan must contribute
NO exchange — the plan-level proof that the held corpus is never
re-shuffled by a daily probe."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from mediaduplicatefinder_spark.config import DEFAULT_CONFIG
from mediaduplicatefinder_spark.operators.crosscorpus import (
    cross_corpus_candidates,
    probe_band_ledger,
    write_band_ledger,
)
from mediaduplicatefinder_spark.operators.extract import (
    extracted_or_given_text,
)
from mediaduplicatefinder_spark.operators.signatures import (
    compute_signatures,
)

TABLE = "test_band_ledger"


def _side_col():
    return F.pmod(F.xxhash64("url"), F.lit(2))


@pytest.fixture(scope="module")
def ledger(spark, tiny_pages_df):
    docs = extracted_or_given_text(tiny_pages_df, use_html=True)
    sigs = compute_signatures(docs, DEFAULT_CONFIG).persist()
    sigs_ref = sigs.filter(_side_col() == 0)
    sigs_new = sigs.filter(_side_col() == 1)
    write_band_ledger(sigs_ref, TABLE, DEFAULT_CONFIG, n_buckets=8)
    yield sigs_ref, sigs_new
    sigs.unpersist()
    spark.sql(f"DROP TABLE IF EXISTS {TABLE}")


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_ledger_probe_equals_inplan_candidates(spark, ledger):
    sigs_ref, sigs_new = ledger
    inplan = _rows(cross_corpus_candidates(sigs_ref, sigs_new))
    probed = _rows(probe_band_ledger(spark, sigs_new, TABLE))
    assert probed == inplan and probed


def test_ledger_probe_salted_identity(spark, ledger):
    _, sigs_new = ledger
    plain = _rows(probe_band_ledger(spark, sigs_new, TABLE))
    salted = _rows(probe_band_ledger(spark, sigs_new, TABLE, n_salt=4))
    assert salted == plain


def _n_exchanges(df) -> int:
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    return len(re.findall(r"\(\d+\) Exchange", plan))


def test_bucketed_scan_contributes_no_exchange(spark, ledger):
    """The whole point of the layout: under a shuffle join (broadcast
    disabled — at production scale the ledger side is 4-5 orders too
    big to broadcast), the ledger plan must carry exactly one FEWER
    exchange than the identical in-plan join — the ref side's shuffle
    is gone; the bucketed scan satisfies the join's clustering
    requirement directly."""
    sigs_ref, sigs_new = ledger
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        inplan = _n_exchanges(cross_corpus_candidates(sigs_ref, sigs_new))
        probed_df = probe_band_ledger(spark, sigs_new, TABLE)
        probed = _n_exchanges(probed_df)
        assert probed == inplan - 1, (probed, inplan)
        # and the ledger scan really is the bucketed table
        plan = probed_df._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
