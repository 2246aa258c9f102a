"""Flesch / Flesch-Kincaid readability (functions/textstats.py E200)
vs hand-computed values under the pinned counting heuristic."""

from __future__ import annotations

from mediaduplicatefinder_spark.functions.textstats import with_readability


def _score(spark, text):
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    return with_readability(df).collect()[0]


def test_hand_computed_simple_sentence(spark):
    r = _score(spark, "The cat sat.")
    assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (3, 1, 3)
    # FRE = 206.835 - 1.015*3 - 84.6*1 = 119.19
    assert abs(r["flesch"] - 119.19) < 1e-9
    # FK = 0.39*3 + 11.8*1 - 15.59 = -2.62
    assert abs(r["fk_grade"] - (-2.62)) < 1e-9
    assert r["readability_band"] == "easy"


def test_syllable_heuristic_cases(spark):
    # before: e|o|e runs = 3, silent final e (not 'le') -> 2
    # people: eo|e runs = 2, ends 'le' -> no subtract -> 2
    # the: 1 run, subtract gated by >= 2 runs -> 1
    # rhythm: y run -> 1
    r = _score(spark, "before people the rhythm")
    assert r["n_syllables"] == 2 + 2 + 1 + 1
    assert r["n_sentences"] == 1  # floor 1 with no terminator


def test_multi_sentence_and_punct_words(spark):
    r = _score(spark, "Hello, world! Is this easy? Yes... it is.")
    assert r["n_sentences"] == 4  # '!', '?', '...', '.'
    assert r["n_words"] == 8


def test_empty_and_nonletter_text(spark):
    r = _score(spark, "12345 !!! ...")
    assert r["n_words"] == 0
    assert r["flesch"] is None and r["fk_grade"] is None
    assert r["readability_band"] == "empty"


def test_null_text_behaves_as_empty(spark):
    # the S1 corrupt-row case: NULL text must match empty-text
    # semantics on both engines (coalesced at the head)
    r = _score(spark, None)
    assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (0, 1, 0)
    assert r["flesch"] is None and r["fk_grade"] is None
    assert r["readability_band"] == "empty"


def test_dense_academic_text_scores_difficult(spark):
    txt = (
        "Institutionalization of multidimensional organizational "
        "accountability necessitates characteristically "
        "incomprehensible administrative considerations."
    )
    r = _score(spark, txt)
    assert r["readability_band"] == "difficult"
    assert r["fk_grade"] > 15
