"""RefinedWeb line-wise corrections (functions/linefilter.py):
rule-by-rule adversarial probes + the 5% document-drop boundary."""

from __future__ import annotations

from mediaduplicatefinder_spark.functions.linefilter import line_cleanup


def _clean(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id: long, text: string"
    )
    return {r.doc_id: r for r in line_cleanup(df).collect()}


def test_rule_mainly_uppercase(spark):
    got = _clean(
        spark,
        [
            "normal line here\nSHARE THIS NOW\nanother normal one",
            # exactly half uppercase letters is NOT "mainly" (strict >)
            "AAaa bb cc\nok line here",
            # 3 upper of 5 alpha -> removed even with lowercase present
            "ABCde QQ\nok line here",
        ],
    )
    assert got[0].cleaned_text == "normal line here\nanother normal one"
    assert got[0].n_removed_lines == 1
    assert got[1].n_removed_lines == 0  # 2*2 == 4 alpha, not >
    assert got[2].n_removed_lines == 1


def test_rule_numeric_only(spark):
    got = _clean(
        spark,
        [
            "keep this line\n12,345\n99.9 %\n7",
            "v2 release notes here",  # digits+letters: kept
        ],
    )
    # "7" also trips one-word; all three furniture lines removed
    assert got[0].cleaned_text == "keep this line"
    assert got[1].n_removed_lines == 0


def test_rule_counter(spark):
    got = _clean(
        spark,
        [
            "real content stays\n3 likes\n12 Shares\n1 comment",
            "3 likes and then more words stay put",
        ],
    )
    assert got[0].cleaned_text == "real content stays"
    assert got[1].n_removed_lines == 0


def test_rule_one_word(spark):
    got = _clean(
        spark,
        [
            "two words\nAdvertisement\n  padded  \nkeep this too",
        ],
    )
    # "Advertisement" and "  padded  " (one word after trim) removed
    assert got[0].cleaned_text == "two words\nkeep this too"
    assert got[0].n_removed_lines == 2


def test_empty_lines_are_structure(spark):
    got = _clean(spark, ["para one stays\n\npara two stays"])
    assert got[0].cleaned_text == "para one stays\n\npara two stays"
    assert got[0].n_removed_lines == 0


def test_doc_drop_five_percent_boundary(spark):
    # total chars 100; removed exactly 5 -> keep (20*5 <= 100);
    # removed 6 -> drop
    keep_line = "k" * 47 + " tail"  # 52 chars, two words, mixed case
    assert len(keep_line) == 52
    got = _clean(
        spark,
        [
            keep_line + "\n" + "x" * 43 + " tail" + "\n" + "12345",  # 52+48+5
            keep_line + "\n" + "x" * 42 + " tail" + "\n" + "123456",  # 52+47+6
        ],
    )
    r0, r1 = got[0], got[1]
    assert r0.total_chars == 105 and r0.removed_chars == 5 and r0.keep_doc
    assert r1.total_chars == 105 and r1.removed_chars == 6 and not r1.keep_doc


def test_counts_and_lengths_consistent(spark):
    got = _clean(spark, ["a b\nONLY CAPS HERE\n42\nword\nc d"])
    r = got[0]
    assert r.n_lines == 5 and r.n_removed_lines == 3
    assert r.total_chars == len("a b") + len("ONLY CAPS HERE") + 2 + 4 + 3
    assert r.removed_chars == len("ONLY CAPS HERE") + 2 + 4
    assert r.cleaned_text == "a b\nc d"


def test_map_only_plan(spark):
    # the whole operator is one projection: no shuffle anywhere
    df = spark.createDataFrame([(1, "a b\nc")], "doc_id: long, text: string")
    plan = line_cleanup(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_ccnet_composition_dropped_doc_not_a_winner(spark):
    """A doc dropped by the 5% rule never enters paragraph dedup: its
    paragraphs cannot win keep-first against surviving docs."""
    from pyspark.sql import functions as F

    from mediaduplicatefinder_spark.operators.paradedup import (
        paragraph_dedup,
    )

    furniture = "\n".join(["FURNITURE LINE %d OK" % i for i in range(30)])
    shared = "this exact paragraph appears in both documents"
    rows = [
        # doc 0: mostly furniture -> dropped; holds the shared paragraph
        (0, furniture + "\n" + shared),
        # doc 1: clean doc with the same paragraph, higher doc_id
        (1, shared + "\nplenty of other normal words in here to keep"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    cleaned = line_cleanup(df)
    got = {r.doc_id: r for r in cleaned.collect()}
    assert not got[0].keep_doc and got[1].keep_doc
    surv = cleaned.filter("keep_doc").select(
        "doc_id", F.col("cleaned_text").alias("text")
    )
    para = {r.doc_id: r for r in paragraph_dedup(surv).collect()}
    # doc 1 keeps the shared paragraph (doc 0 is out of the universe)
    assert shared in para[1].text_deduped
    assert para[1].n_dropped == 0
