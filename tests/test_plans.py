"""Physical-plan assertions — the plans the engine is DESIGNED to
produce (SURVEY.md §4.3), checked from explain() output so regressions
in partitioning/pushdown/broadcast strategy fail loudly:

- column pruning + filter pushdown reach the parquet scan
- the exact pass costs exactly one exchange (on the hash)
- candidate banding groups on (lang, band, bh)
- top-k search broadcasts the query side
- hot-path joins use the int64 doc_key, not url strings
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def plan_of(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def test_scan_column_pruning(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id", "lang")
    p = plan_of(d)
    assert "ReadSchema" in p
    # only the projected columns reach the scan
    read_schema = [l for l in p.splitlines() if "ReadSchema" in l][0]
    assert "doc_id" in read_schema and "lang" in read_schema
    assert "text" not in read_schema


def test_filter_pushdown_to_scan(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet").filter(
        F.col("lang") == "en"
    )
    p = plan_of(d)
    pushed = [l for l in p.splitlines() if "PushedFilters" in l]
    assert pushed and "lang" in pushed[0]


def test_exact_pass_single_exchange_and_no_text_shuffle(spark):
    """Sig-first invariant: the exact pass costs ONE exchange (on sha256)
    and that exchange carries SIGNATURE rows — the raw text column is
    consumed by the narrow extract+signature prefix and never crosses a
    shuffle (VERDICT r1 item 1)."""
    from mediaduplicatefinder_spark.operators import exact as exact_ops
    from mediaduplicatefinder_spark.operators.signatures import compute_signatures

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("url"),
        "lang",
        F.octet_length("text").cast("long").alias("size_bytes"),
        "text",
    )
    sigs_all = compute_signatures(
        exact_ops.with_sha256(docs), include_minhash=False, carry_sha256=True
    )
    grouped = exact_ops.exact_groups(sigs_all)
    p = plan_of(grouped)
    # count + row_number + min over the same partition key: ONE exchange
    # (formatted explain lists each node twice: tree + detail section)
    import re

    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1
    assert "sha256" in p

    # the Exchange's input attribute list must not contain the text column
    lines = p.splitlines()
    (ex_idx,) = [
        i for i, l in enumerate(lines) if re.match(r"\(\d+\) Exchange", l.strip())
        and i + 1 < len(lines) and lines[i + 1].startswith("Input")
    ]
    exchange_input = lines[ex_idx + 1]
    assert "text#" not in exchange_input
    assert "token_hashes" in exchange_input  # sig rows are what shuffles


def test_banding_groups_on_band_key(spark):
    from mediaduplicatefinder_spark.operators.candidates import candidate_pairs
    from mediaduplicatefinder_spark.operators.signatures import compute_signatures

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("url"),
        "lang",
        F.octet_length("text").cast("long").alias("size_bytes"),
        "text",
    )
    sigs = compute_signatures(docs, include_minhash=False)
    cands, metrics, buckets = candidate_pairs(sigs)
    p = plan_of(buckets)
    assert "hashpartitioning(lang" in p and "band" in p
    # band rows carry the int64 key, never the url string
    cp = plan_of(cands)
    assert "key_a" in cp and "url_a" not in cp


def test_cosine_topk_broadcasts_queries(spark):
    from mediaduplicatefinder_spark.operators.embeddings import cosine_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") % 50 == 0)
    topk = cosine_topk(emb, q, k=5)
    p = plan_of(topk)
    assert "Broadcast" in p  # query side broadcast; only queries move
    # scoring stays JVM-side: no Python/Pandas UDF eval in the plan
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    # VERDICT r2 item 2: the scoring stage must not inherit a single-split
    # scan's 1-task layout — the corpus side widens to defaultParallelism
    # (the sf0.001 embeddings file is a single split, so the round-robin
    # repartition must appear under the crossJoin's stream side)
    assert "RoundRobinPartitioning" in p


def test_verify_joins_on_int_keys(spark):
    from mediaduplicatefinder_spark.operators.candidates import candidate_pairs
    from mediaduplicatefinder_spark.operators.signatures import compute_signatures
    from mediaduplicatefinder_spark.operators.verify import verify_pairs

    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("url"),
        "lang",
        F.octet_length("text").cast("long").alias("size_bytes"),
        "text",
    )
    sigs = compute_signatures(docs, include_minhash=False)
    cands, _m, _b = candidate_pairs(sigs)
    p = plan_of(verify_pairs(cands, sigs))
    # the pair->signature joins key on doc_key ints
    assert "key_a" in p and "key_b" in p


def test_pair_queries_have_no_cartesian_product(spark):
    """VERDICT r1 item 7: the all-pairs queries (jaccard twin + the
    name-pair family) run on the triangle-blocked operator — no
    CartesianProduct / nested-loop join anywhere in their plans."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    for name in (
        "jaccard_pairs",
        "size_ratio_pairs",
        "hamming_pairs",
        "ngram_jaccard_pairs",
        "charbag_name_sim",
        "audio_name_pairs",
        "archive_pairs",
        "embedding_dup_pairs",
    ):
        p = plan_of(qs[name](spark, SF))
        assert "CartesianProduct" not in p, name
        assert "BroadcastNestedLoopJoin" not in p, name


def test_pair_queries_never_shuffle_raw_text(spark):
    """VERDICT r2 item 3: tfidf_pairs / line_match_pairs compute compact
    per-doc representations (sorted term counts / line-hash arrays) ONCE
    and route pairs through the triangle-blocked operator — no raw text
    column crosses any exchange, and no plain self-join on (lang,
    source) remains."""
    import re

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    for name in ("tfidf_pairs", "line_match_pairs"):
        p = plan_of(qs[name](spark, SF))
        lines = p.splitlines()
        for i, l in enumerate(lines):
            if re.match(r"\(\d+\) Exchange", l.strip()) and i + 1 < len(lines):
                nxt = lines[i + 1]
                if nxt.startswith("Input"):
                    assert "text#" not in nxt, (name, nxt)
        assert "FlatMapGroupsInPandas" in p, name


def test_span_dedup_winner_agg_partial_combines(spark):
    """E28's hot-span safety rests on the winner min(struct) partial-
    aggregating BEFORE the span exchange (one row per partition per
    distinct span, not per occurrence)."""
    from mediaduplicatefinder_spark.operators.spandedup import span_dedup

    p = plan_of(span_dedup(spark.read.parquet(f"{SF}/documents.parquet")))
    assert "partial_min" in p
    assert "CartesianProduct" not in p


def test_corpus_mix_is_map_only_plus_one_exchange(spark):
    """E29: the sampling gate must be a map-side projection — the only
    exchange in the whole plan is the final per-source count agg."""
    from mediaduplicatefinder_spark.operators.selection import corpus_mix

    import re

    df = corpus_mix(spark.read.parquet(f"{SF}/documents.parquet"))
    p = plan_of(df)
    assert len(re.findall(r"\(\d+\) Exchange", p)) == 1
    # column pruning: the scan must not read text
    scan = [ln for ln in p.splitlines() if "ReadSchema" in ln]
    assert scan and "text" not in scan[0]
