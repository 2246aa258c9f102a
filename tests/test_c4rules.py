"""C4 cleanup rules (functions/c4rules.py, E49)."""

from __future__ import annotations

from mediaduplicatefinder_spark.functions.c4rules import c4_rules


def _run(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id: long, text: string"
    )
    return {r.doc_id: r for r in c4_rules(df).collect()}


GOOD = "This sentence has enough words to stay alive."


def test_line_filter_terminal_punct_and_word_count(spark):
    got = _run(
        spark,
        [
            "\n".join(
                [
                    GOOD,
                    "Too short here.",  # 3 words -> dropped
                    "five whole words but no terminal mark",  # dropped
                    'A quoted ending also counts as terminal."',
                    "Questions count as terminal punctuation too right?",
                    "And exclamations also do count as terminal!",
                ]
            )
        ],
    )
    r = got[0]
    assert r.n_lines == 6 and r.n_kept_lines == 4
    assert GOOD in r.cleaned_text
    assert "Too short" not in r.cleaned_text


def test_page_sentence_minimum(spark):
    two = GOOD + "\n" + "Another valid sentence right here for you."
    three = two + "\n" + "A third valid sentence appears right here."
    got = _run(spark, [two, three])
    assert not got[0].keep_page and got[0].n_sentences == 2
    assert got[1].keep_page and got[1].n_sentences == 3


def test_page_flags(spark):
    base = "\n".join([GOOD, GOOD, GOOD])
    got = _run(
        spark,
        [
            base + "\nA curly { brace hides in this sentence.",
            base + "\nSome Lorem IPSUM text sits inside this sentence.",
            base + "\nSadly badword1 appears within this long sentence.",
            # bad word only as substring of a longer word: NOT flagged
            base + "\nThe notbadword1ish compound should not trip this.",
            base,
        ],
    )
    assert got[0].has_brace and not got[0].keep_page
    assert got[1].has_lorem and not got[1].keep_page
    assert got[2].has_badword and not got[2].keep_page
    assert not got[3].has_badword and got[3].keep_page
    assert got[4].keep_page


def test_flags_evaluated_on_surviving_text_only(spark):
    # the brace lives on a line the line-filter removes -> page keeps
    base = "\n".join([GOOD, GOOD, GOOD])
    got = _run(spark, [base + "\n{ dropped }"])
    assert not got[0].has_brace and got[0].keep_page


def test_empty_and_all_dropped(spark):
    got = _run(spark, ["", "no punct\nshort."])
    for i in (0, 1):
        assert got[i].n_kept_lines == 0
        assert got[i].cleaned_text == ""
        assert not got[i].keep_page


def test_map_only_plan(spark):
    df = spark.createDataFrame([(1, GOOD)], "doc_id: long, text: string")
    plan = c4_rules(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
