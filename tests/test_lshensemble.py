"""E174 LSH Ensemble: plan-table sanity (sensitivity grows with the
partition's size bound), probe recall on planted containment pairs,
exact-containment verification vs a python reference, partition
invariance, and no cartesian product."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from mediaduplicatefinder_spark.config import DEFAULT_CONFIG
from mediaduplicatefinder_spark.functions.sigcore import token_seq
from mediaduplicatefinder_spark.operators.extract import (
    extracted_or_given_text,
)
from mediaduplicatefinder_spark.operators.lshensemble import (
    ensemble_plan,
    lsh_ensemble_containment,
    part_of,
)
from mediaduplicatefinder_spark.operators.signatures import (
    compute_signatures,
)

T = 0.5


def test_plan_table_structure():
    plans = ensemble_plan(T, 128)
    assert [p.part for p in plans] == [0, 1, 2, 3]
    # sensitivity must grow with the partition's size bound: rows
    # non-increasing, the big partitions at r=1 (the paper's regime)
    rows = [p.rows for p in plans]
    assert rows == sorted(rows, reverse=True)
    assert plans[-1].rows == 1
    for p in plans:
        assert 1 <= p.bands * p.rows <= 128


def test_part_of_boundaries():
    assert part_of(1, 3, 4) == 0
    assert part_of(7, 3, 4) == 0
    assert part_of(8, 3, 4) == 1
    assert part_of(63, 3, 4) == 1
    assert part_of(64, 3, 4) == 2
    assert part_of(512, 3, 4) == 3
    assert part_of(10**6, 3, 4) == 3  # open-ended last partition


@pytest.fixture(scope="module")
def corpus(spark):
    """Synthetic containment corpus: big docs + 25-token quotes."""
    rng = random.Random(5)
    vocab = [f"word{i:04d}" for i in range(3000)]
    rows = []
    for i in range(40):
        words = rng.sample(vocab, rng.randint(120, 400))
        rows.append((f"doc://{i:010d}", "en", " ".join(words)))
    quotes = []
    for i in range(40, 60):
        src = rows[i - 40]
        quote = " ".join(src[2].split()[:25])
        quotes.append((f"doc://{i:010d}", "en", quote))
    # noise docs another lang (must never pair with en queries)
    for i in range(60, 70):
        words = rng.sample(vocab, 200)
        rows.append((f"doc://{i:010d}", "de", " ".join(words)))
    pages = spark.createDataFrame(
        [(u, None, t, l) for (u, l, t) in rows + quotes],
        "url string, warc_ts timestamp, text string, lang string",
    )
    docs = extracted_or_given_text(pages, use_html=False)
    sigs = compute_signatures(docs, DEFAULT_CONFIG).persist()
    is_q = F.substring("url", 7, 10).cast("long") >= 40
    is_q = is_q & (F.substring("url", 7, 10).cast("long") < 60)
    yield sigs.filter(~is_q), sigs.filter(is_q), rows, quotes
    sigs.unpersist()


def _truth(rows, quotes):
    """Exact containment over distinct >=3-char tokens."""
    sets = {u: set(token_seq(t, 3)) for (u, _, t) in rows}
    out = {}
    for (uq, lq, tq) in quotes:
        q = set(token_seq(tq, 3))
        for (ux, lx, _) in rows:
            if lx != lq or not q:
                continue
            c = len(q & sets[ux]) / len(q)
            if c >= T:
                out[(uq, ux)] = c
    return out


def test_planted_quotes_found_with_exact_containment(corpus):
    sigs_x, sigs_q, rows, quotes = corpus
    got = {
        (r["url_q"], r["url_x"]): r["containment"]
        for r in lsh_ensemble_containment(sigs_x, sigs_q, t=T).collect()
    }
    truth = _truth(rows, quotes)
    # every quote's source pair is in the truth at containment 1.0 and
    # must be found (the whole point of the ensemble: J here is far
    # below the standard banding's operating point)
    for i, (uq, _, _) in enumerate(quotes):
        src = f"doc://{i:010d}"
        assert truth.get((uq, src), 0) >= 0.99
        assert (uq, src) in got, uq
    # soundness: every emitted pair's containment matches the python
    # exact value (fold-32 collisions would show here)
    for k, v in got.items():
        assert k in truth and abs(truth[k] - v) < 1e-9
    # recall against full truth (banding can in principle miss, but at
    # C >= 0.5 with r=1/b>=107 partitions the probe probability is
    # overwhelming; a drop means a broken fold)
    assert len(set(got) & set(truth)) / len(truth) >= 0.95


def test_no_cross_lang_pairs(corpus):
    sigs_x, sigs_q, _, _ = corpus
    de = {
        r["url_x"]
        for r in lsh_ensemble_containment(sigs_x, sigs_q, t=T).collect()
        if int(r["url_x"][6:]) >= 60
    }
    assert not de


def test_partition_invariance(corpus):
    sigs_x, sigs_q, _, _ = corpus
    a = sorted(
        map(
            tuple,
            lsh_ensemble_containment(
                sigs_x.coalesce(1), sigs_q.coalesce(1), t=T
            ).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            lsh_ensemble_containment(
                sigs_x.repartition(7), sigs_q.repartition(5), t=T
            ).collect(),
        )
    )
    assert a == b and a


def test_plan_no_cartesian(corpus):
    sigs_x, sigs_q, _, _ = corpus
    plan = (
        lsh_ensemble_containment(sigs_x, sigs_q, t=T)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
