"""Datagen determinism + class construction properties (FIXTURES.md)."""

from __future__ import annotations

from mediaduplicatefinder_spark.datagen.pages import generate_pages
from mediaduplicatefinder_spark.oracle.textsim import extract_words, jaccard


def test_deterministic():
    a_pages, a_truth = generate_pages(150, seed=42, min_words=30, max_words=100)
    b_pages, b_truth = generate_pages(150, seed=42, min_words=30, max_words=100)
    assert a_pages.equals(b_pages)
    assert a_truth.equals(b_truth)


def test_seed_changes_output():
    a, _ = generate_pages(100, seed=1, min_words=30, max_words=100)
    b, _ = generate_pages(100, seed=2, min_words=30, max_words=100)
    assert not a.equals(b)


def test_urls_unique_and_sorted():
    pages, _ = generate_pages(200, seed=42, min_words=30, max_words=100)
    urls = pages.url.tolist()
    assert len(set(urls)) == len(urls)
    assert urls == sorted(urls)


def test_planted_jaccard_targets():
    pages, truth = generate_pages(400, seed=42, min_words=50, max_words=150)
    merged = pages.merge(truth, on="url")
    for kind, lo, hi in [("near_high", 0.72, 0.95), ("simhash_pair", 0.93, 1.0)]:
        sub = merged[merged.class_kind == kind]
        for cid, grp in sub.groupby("class_id"):
            texts = grp.text.tolist()
            if len(texts) < 2:
                continue
            j = jaccard(extract_words(texts[0]), extract_words(texts[1]))
            assert lo <= j <= hi, (kind, cid, j)


def test_exact_class_is_byte_identical():
    pages, truth = generate_pages(300, seed=42, min_words=30, max_words=100)
    merged = pages.merge(truth, on="url")
    ex = merged[merged.class_kind == "exact"]
    for cid, grp in ex.groupby("class_id"):
        assert grp.text.nunique() == 1


def test_html_wraps_text():
    pages, _ = generate_pages(50, seed=42, min_words=30, max_words=100)
    for _, r in pages.iterrows():
        html = bytes(r.html).decode()
        start = html.find("<body>") + len("<body>")
        end = html.rfind("</body>")
        assert html[start:end] == r.text
