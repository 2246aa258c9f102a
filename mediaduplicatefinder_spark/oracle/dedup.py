"""Oracle end-to-end dedup over an in-memory list of pages — the golden
spec for the Spark pipeline (SURVEY.md §5.2 layer 1).

Mirrors main_cli.cpp:713-803 control flow:
  1. exact groups by content hash          (main_cli.cpp:541-575)
  2. non-first members excluded from the
     similarity universe                   (main_cli.cpp:755-768)
  3. greedy star clustering in scan order  (main_cli.cpp:577-708)
  4. keeper per group by directory priority (duplicate_gui.py:650-658)

"Scan order" here is input-list order; generators emit rows sorted by
url so the Spark side can reproduce order with orderBy(url).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from mediaduplicatefinder_spark.oracle import textsim


@dataclass
class Page:
    url: str
    text: str
    lang: str
    html: bytes = b""

    @property
    def size_bytes(self) -> int:
        return len(self.html) if self.html else len(self.text.encode())


@dataclass
class OracleResult:
    exact_groups: list[list[str]] = field(default_factory=list)  # urls per group
    similar_groups: list[list[tuple[str, float]]] = field(default_factory=list)
    pairs: set[tuple[str, str]] = field(default_factory=set)  # url_a < url_b
    pair_scores: dict[tuple[str, str], float] = field(default_factory=dict)
    keepers: dict[str, str] = field(default_factory=dict)  # group seed url -> keeper


def exact_duplicate_groups(pages: list[Page]) -> list[list[str]]:
    """Equivalence classes of identical text bytes, size >= 2, emitted in
    hash-lexicographic order (std::map semantics, main_cli.cpp:541-575)."""
    by_hash: dict[str, list[str]] = {}
    for p in pages:
        by_hash.setdefault(textsim.sha256_hex(p.text.encode()), []).append(p.url)
    return [urls for h, urls in sorted(by_hash.items()) if len(urls) >= 2]


def similar_star_groups(
    pages: list[Page],
    exclude: set[str],
    *,
    use_name_shortcut: bool = False,
    max_lines: int = 50,
) -> list[list[tuple[str, float]]]:
    """Greedy star clustering in scan order (main_cli.cpp:629-705):
    first unprocessed page seeds a group; every later unprocessed page of
    the same lang that is similar TO THE SEED joins (never re-seeds);
    groups of size 1 are discarded. Seed score 1.0; member score = its
    seed-similarity (main_cli.cpp:633-634, 683-684)."""
    universe = [p for p in pages if p.url not in exclude]
    processed = [False] * len(universe)
    groups: list[list[tuple[str, float]]] = []
    for i, seed in enumerate(universe):
        if processed[i]:
            continue
        processed[i] = True
        group = [(seed.url, 1.0)]
        for j in range(i + 1, len(universe)):
            if processed[j]:
                continue
            cand = universe[j]
            if cand.lang != seed.lang:  # same-type gate (main_cli.cpp:331,638)
                continue
            ok, score = textsim.documents_similar(
                seed.size_bytes,
                cand.size_bytes,
                seed.url,
                cand.url,
                seed.text,
                cand.text,
                use_name_shortcut=use_name_shortcut,
            )
            if ok:
                group.append((cand.url, score))
                processed[j] = True
        if len(group) > 1:
            groups.append(group)
    return groups


def all_similar_pairs(
    pages: list[Page],
    exclude: set[str],
    *,
    use_name_shortcut: bool = False,
) -> dict[tuple[str, str], float]:
    """The FULL pairwise similar relation (not star-pruned): every
    same-lang pair passing areDocumentsSimilar. This is the recall
    denominator — the star scan tests each pair at most once, so every
    (seed, member) edge it finds is in this set."""
    universe = [p for p in pages if p.url not in exclude]
    out: dict[tuple[str, str], float] = {}
    by_lang: dict[str, list[Page]] = {}
    for p in universe:
        by_lang.setdefault(p.lang, []).append(p)
    for plist in by_lang.values():
        for i in range(len(plist)):
            for j in range(i + 1, len(plist)):
                a, b = plist[i], plist[j]
                ok, score = textsim.documents_similar(
                    a.size_bytes, b.size_bytes, a.url, b.url, a.text, b.text,
                    use_name_shortcut=use_name_shortcut,
                )
                if ok:
                    key = (a.url, b.url) if a.url < b.url else (b.url, a.url)
                    out[key] = score
    return out


def keeper_priority(url: str, scan_root: str) -> tuple[int, str]:
    """duplicate_gui.py:650-658: (0,"") if the page sits directly under the
    scan root, else (1, dirname)."""
    d = textsim.url_dirname(url)
    return (0, "") if d == scan_root else (1, d)


def select_keepers(
    groups: list[list[str]], scan_root: str
) -> list[tuple[str, list[str]]]:
    """Per group: stable-sort members by priority (ties keep scan order,
    matching Python sorted stability in duplicate_gui.py:828-834); first
    is the keeper, rest are redundant."""
    out = []
    for g in groups:
        ordered = sorted(g, key=lambda u: keeper_priority(u, scan_root))
        out.append((ordered[0], ordered[1:]))
    return out


def run_oracle(
    pages: list[Page],
    scan_root: str = "",
    *,
    use_name_shortcut: bool = False,
) -> OracleResult:
    res = OracleResult()
    res.exact_groups = exact_duplicate_groups(pages)
    # pass-2 exclusion: non-FIRST member of each exact group, where "first"
    # is scan order within the group (main_cli.cpp:755-760)
    exclude: set[str] = set()
    for g in res.exact_groups:
        exclude.update(g[1:])
    res.similar_groups = similar_star_groups(
        pages, exclude, use_name_shortcut=use_name_shortcut
    )
    for group in res.similar_groups:
        seed = group[0][0]
        for url, score in group[1:]:
            key = (seed, url) if seed < url else (url, seed)
            res.pairs.add(key)
            res.pair_scores[key] = score
    for g in res.exact_groups:
        keeper, _rest = select_keepers([g], scan_root)[0]
        res.keepers[g[0]] = keeper
    return res
