

def test_host_lang_profile(spark):
    from mediaduplicatefinder_spark.operators.stats import host_lang_profile

    rows = (
        [("mix", "en")] * 3 + [("mix", "de")] * 3 + [("mix", "fr")] * 2
        + [("eng", "en")] * 9 + [("eng", "de")]
        + [("solo", "fr")] * 4
        + [("tie", "aa")] * 2 + [("tie", "bb")] * 2
    )
    df = spark.createDataFrame(rows, "host string, lang string")
    got = {r.host: r for r in host_lang_profile(df).collect()}
    mix = got["mix"]
    # main 'en' or 'de' tie at 3 -> lexically LAST wins ('en')
    assert (mix.n_docs, mix.n_langs, mix.main_lang) == (8, 3, "en")
    assert mix.mixed  # 3*2 < 8
    eng = got["eng"]
    assert (eng.main_lang, eng.main_count, eng.mixed) == ("en", 9, False)
    solo = got["solo"]
    assert (solo.n_langs, solo.mixed) == (1, False)
    tie = got["tie"]
    assert tie.main_lang == "bb"  # deterministic lexical-last tiebreak
    assert not tie.mixed  # exactly half (2*2 == 4) is NOT mixed
