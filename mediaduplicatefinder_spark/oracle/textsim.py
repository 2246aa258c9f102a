"""Pure-Python ports of the reference's scalar similarity semantics.

Each function cites the reference lines it reproduces; these are
re-implementations of *published behavior* (MIT-licensed reference),
not copies — the point is an executable golden spec for pytest.
"""

from __future__ import annotations

import hashlib
from collections import Counter


def extract_words(text: str, min_len: int = 3) -> set[str]:
    """Whitespace-split, strip non-alnum chars per token, lowercase,
    keep len > 2, dedupe (main_cli.cpp:272-283).

    ``isalnum`` in the reference is byte-wise C — equivalent to keeping
    only [a-zA-Z0-9] for the ASCII corpus this engine normalizes to.
    """
    words: set[str] = set()
    for raw in text.split():
        w = "".join(ch for ch in raw if ch.isalnum() and ord(ch) < 128).lower()
        if len(w) >= min_len:
            words.add(w)
    return words


def jaccard(a: set[str], b: set[str]) -> float:
    """|∩| / (|A|+|B|-|∩|); empty -> 0.0 (main_cli.cpp:285-294)."""
    common = len(a & b)
    total = len(a) + len(b) - common
    return common / total if total > 0 else 0.0


def text_similarity(text1: str, text2: str) -> float:
    """calculateTextSimilarity: empty text -> 0.0 (main_cli.cpp:286)."""
    if not text1 or not text2:
        return 0.0
    return jaccard(extract_words(text1), extract_words(text2))


def string_similarity(s1: str, s2: str) -> float:
    """Char-bag similarity (main_cli.cpp:341-357): lowercase; equal -> 1.0;
    substring containment either way -> 0.8; else
    2 * sum_c cnt1(c)*cnt2(c) / (len1+len2) — the cross-product count,
    which CAN exceed 1.0 on repeated chars; reproduced as-is for parity.
    """
    s1l, s2l = s1.lower(), s2.lower()
    if s1l == s2l:
        return 1.0
    if s2l and s2l in s1l:
        return 0.8
    if s1l and s1l in s2l:
        return 0.8
    c1, c2 = Counter(s1l), Counter(s2l)
    common = sum(c1[ch] * c2[ch] for ch in c1)
    total = len(s1l) + len(s2l)
    return (2.0 * common) / total if total > 0 else 0.0


def size_ratio(n1: int, n2: int) -> float:
    """min/max ratio (main_cli.cpp:297-299)."""
    hi = max(n1, n2)
    return (min(n1, n2) / hi) if hi > 0 else 0.0


def url_stem(url: str) -> str:
    """fs::path::stem analog for urls (main_cli.cpp:246-247)."""
    base = url.rsplit("/", 1)[-1]
    dot = base.rfind(".")
    return base[:dot] if dot > 0 else base


def url_dirname(url: str) -> str:
    """os.path.dirname analog (duplicate_gui.py:651)."""
    return url.rsplit("/", 1)[0] if "/" in url else ""


def first_n_lines(text: str, n: int = 50) -> str:
    """getline-loop truncation (main_cli.cpp:260-270): each of the first
    n lines re-terminated with '\\n'."""
    if not text:
        return ""
    lines = text.split("\n")
    if lines and lines[-1] == "":
        lines = lines[:-1]
    return "".join(line + "\n" for line in lines[:n])


def sha256_hex(data: bytes) -> str:
    """Exact-dup content key (main_cli.cpp:488-526), lowercase hex."""
    return hashlib.sha256(data).hexdigest()


def audio_similarity(stem1: str, stem2: str) -> tuple[bool, float]:
    """Audio stem rule (main_cli.cpp:245-257)."""
    n1, n2 = stem1.lower(), stem2.lower()
    if n1 == n2:
        return True, 1.0
    if n1 + "1" == n2 or n2 + "1" == n1 or n1 + "2" == n2 or n2 + "2" == n1:
        return True, 0.95
    sim = string_similarity(n1, n2)
    return sim > 0.9, sim


def archive_similarity(
    size1: int, size2: int, stem1: str, stem2: str
) -> tuple[bool, float]:
    """Archive rule (main_cli.cpp:319-327)."""
    sr = size_ratio(size1, size2)
    ns = string_similarity(stem1, stem2)
    similar = sr > 0.8 and ns > 0.6
    return similar, (sr + ns) / 2.0 if similar else 0.0


def documents_similar(
    size1: int,
    size2: int,
    url1: str,
    url2: str,
    text1: str,
    text2: str,
    *,
    use_name_shortcut: bool = False,
) -> tuple[bool, float]:
    """areDocumentsSimilar (main_cli.cpp:296-316) adapted to webtext:

    - size-ratio < 0.3 -> not similar (main_cli.cpp:297-299)
    - name-sim > 0.7 shortcut (main_cli.cpp:304) only applies to
      .txt/.csv/.pdf-style *file* stems; web urls carry synthetic slugs
      where the char-bag metric degenerates (SURVEY.md P8 note), so the
      webtext profile disables it by default (config-gated).
    - Jaccard of first-50-line word sets > 0.6 (main_cli.cpp:310-313).
    """
    if size_ratio(size1, size2) < 0.3:
        return False, 0.0
    if use_name_shortcut:
        ns = string_similarity(url_stem(url1), url_stem(url2))
        if ns > 0.7:
            return True, ns
    sim = text_similarity(first_n_lines(text1), first_n_lines(text2))
    return sim > 0.6, sim
