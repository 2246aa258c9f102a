"""TLSH-style fuzzy digests (functions/tlsh.py, E164)."""

from __future__ import annotations

from mediaduplicatefinder_spark.functions.tlsh import (
    MIN_LEN,
    PEARSON,
    normalize,
    tlsh_digest,
    with_tlsh,
)


def _body_dist(a: str, b: str) -> int:
    """2-bit cell distance (diff of 3 counts 6 — the spec's penalty)."""
    d = 0
    for ca, cb in zip(bytes.fromhex(a), bytes.fromhex(b)):
        for sh in (0, 2, 4, 6):
            x = abs(((ca >> sh) & 3) - ((cb >> sh) & 3))
            d += 6 if x == 3 else x
    return d


BASE = (
    "the quick brown fox jumps over the lazy dog while seventeen "
    "other animals watch from the fence and remark upon the weather "
    "in considerable detail for quite some time afterwards"
)


def test_pearson_is_a_permutation():
    assert sorted(PEARSON) == list(range(256))


def test_min_length_gate():
    assert tlsh_digest("too short") is None
    assert tlsh_digest(BASE) is not None


def test_edit_locality():
    # a small edit moves the digest far less than an unrelated text
    edited = BASE.replace("seventeen", "nineteen")
    other = (
        "completely different content about databases and query plans "
        "with nothing shared beyond the alphabet itself and some länge "
        "padding words to pass the minimum length gate comfortably"
    )
    d0 = tlsh_digest(BASE)
    d1 = tlsh_digest(edited)
    d2 = tlsh_digest(other)
    near = _body_dist(d0[3], d1[3])
    far = _body_dist(d0[3], d2[3])
    assert near < far / 2
    # normalization invariance: case/punctuation don't move the digest
    assert tlsh_digest(BASE.upper() + "!!!") == d0


def test_reordering_tolerance():
    # TLSH profiles local structure: swapping two sentence halves keeps
    # most windows intact -> small distance
    half = len(BASE) // 2
    swapped = BASE[half:] + " " + BASE[:half]
    d = _body_dist(tlsh_digest(BASE)[3], tlsh_digest(swapped)[3])
    other = "x" * MIN_LEN + " completely unrelated ballast text here"
    dfar = _body_dist(tlsh_digest(BASE)[3], tlsh_digest(other)[3])
    assert d < dfar


def test_spark_udf_matches_python(spark):
    texts = [BASE, BASE.replace("fox", "cat"), "short", BASE * 3]
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.lvalue, r.q1_ratio, r.q2_ratio, r.body)
        for r in with_tlsh(df).collect()
    }
    for i, t in enumerate(texts):
        want = tlsh_digest(t)
        if want is None:
            assert i not in got
        else:
            assert got[i] == want
    # partition invariance
    got7 = {
        r.doc_id: (r.lvalue, r.q1_ratio, r.q2_ratio, r.body)
        for r in with_tlsh(df.repartition(7)).collect()
    }
    assert got7 == got
