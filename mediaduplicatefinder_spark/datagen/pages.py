"""Deterministic synthetic `pages` corpus (FIXTURES.md §1).

Pure function of (seed, n_docs): the same table at any parallelism, any
scale — required for the N vs 4N scaling comparison to be
apples-to-apples and for golden tests to be stable.

Schema (BASELINE.json input_hint):
    pages(url string, warc_ts timestamp, html binary, text string, lang string)
Side table (test-only, never an engine input):
    pages_truth(url string, class_id long, class_kind string)

Planted classes (FIXTURES.md):
    exact            byte-identical text, groups of 2-6
    near_high        token-set Jaccard ~ 0.85
    near_borderline  Jaccard ~ 0.55-0.65 straddling the 0.6 threshold
    simhash_pair     tiny perturbation (J ~ 0.98, Hamming(SimHash) small)
    trunc_pair       identical first 50 lines, divergent tail (the
                     reference compares only the first 50 lines,
                     main_cli.cpp:260-270 — still similar)
    boilerplate_skew one host, shared 150-token template (one giant
                     LSH bucket -> exercises salting/cap)
    negative         unique docs + cross-lang twins (must NOT pair)
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

LANGS = ["en", "de", "fr", "el"]
LANG_P = [0.80, 0.08, 0.07, 0.05]
_LETTERS = np.array(list("abcdefghijklmnopqrstuvwxyz"))
BASE_TS = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)


def _vocab(rng: np.random.RandomState, size: int = 50_000) -> np.ndarray:
    lengths = rng.randint(3, 10, size=size * 2)
    words = ["".join(_LETTERS[rng.randint(0, 26, size=ln)]) for ln in lengths]
    uniq = list(dict.fromkeys(words))
    return np.array(uniq[:size])


class _Builder:
    def __init__(self, seed: int, n_docs: int, min_words: int, max_words: int):
        self.rng = np.random.RandomState(seed)
        self.vocab = _vocab(self.rng)
        self.n_docs = n_docs
        self.min_words, self.max_words = min_words, max_words
        self.rows: list[tuple] = []
        self.truth: list[tuple] = []
        self.class_id = 0
        hosts = [
            f"{self.vocab[self.rng.randint(len(self.vocab))]}{i:03d}.example.org"
            for i in range(max(4, n_docs // 200))
        ]
        self.hosts = hosts
        self.boiler_host = f"boilerfarm.{hosts[0]}"

    def _words(self, n: int) -> np.ndarray:
        idx = self.rng.choice(len(self.vocab), size=n, replace=False)
        return self.vocab[idx]

    def _lang(self) -> str:
        return LANGS[int(self.rng.choice(len(LANGS), p=LANG_P))]

    def _url(self, host: str, depth: int | None = None) -> str:
        i = len(self.rows)
        if depth is None:
            depth = int(self.rng.randint(0, 3))
        segs = "/".join(
            self.vocab[self.rng.randint(len(self.vocab))] for _ in range(depth)
        )
        slug = self.vocab[self.rng.randint(len(self.vocab))]
        path = f"{segs}/{slug}-{i:08d}.html" if segs else f"{slug}-{i:08d}.html"
        return f"https://{host}/{path}"

    def _emit(self, text: str, lang: str, kind: str, class_id: int, host=None, depth=None):
        url = self._url(host or self.hosts[self.rng.randint(len(self.hosts))], depth)
        i = len(self.rows)
        ts = BASE_TS + dt.timedelta(seconds=int(i) * 7)
        title = url.rsplit("/", 1)[-1].removesuffix(".html")
        html = (
            f"<html><head><title>{title}</title></head><body>{text}</body></html>"
        ).encode("utf-8")
        self.rows.append((url, ts, html, text, lang))
        self.truth.append((url, class_id, kind))
        return url

    def _text_from(self, words: np.ndarray, lines: int = 5) -> str:
        words = list(words)
        self.rng.shuffle(words)
        per = max(1, len(words) // lines)
        out = []
        for i in range(0, len(words), per):
            out.append(" ".join(words[i : i + per]))
        return "\n".join(out)

    def _variant(self, words: np.ndarray, jaccard: float) -> np.ndarray:
        """Replace x words so token-set Jaccard(base, variant) == target:
        J = (m-x)/(m+x)  =>  x = round(m(1-J)/(1+J))."""
        m = len(words)
        x = int(round(m * (1 - jaccard) / (1 + jaccard)))
        if x == 0:
            return words.copy()
        keep = words[: m - x]
        fresh = self._fresh_words(x, exclude=set(words))
        return np.concatenate([keep, fresh])

    def _fresh_words(self, n: int, exclude: set) -> np.ndarray:
        out: list[str] = []
        while len(out) < n:
            cand = self.vocab[self.rng.randint(len(self.vocab), size=n * 2)]
            out.extend([w for w in cand if w not in exclude][: n - len(out)])
        return np.array(out[:n])

    # ---- class emitters ----
    def emit_exact_group(self):
        lang = self._lang()
        text = self._text_from(self._words(self.rng.randint(self.min_words, self.max_words)))
        cid = self.class_id = self.class_id + 1
        for _ in range(int(self.rng.randint(2, 7))):
            if len(self.rows) < self.n_docs:
                self._emit(text, lang, "exact", cid)

    def emit_near_group(self, kind: str, j_lo: float, j_hi: float, size: int = 2):
        lang = self._lang()
        base = self._words(self.rng.randint(max(self.min_words, 40), self.max_words))
        cid = self.class_id = self.class_id + 1
        self._emit(self._text_from(base), lang, kind, cid)
        for _ in range(size - 1):
            if len(self.rows) < self.n_docs:
                j = self.rng.uniform(j_lo, j_hi)
                self._emit(self._text_from(self._variant(base, j)), lang, kind, cid)

    def emit_trunc_pair(self):
        """Identical first 60 lines (only first 50 compared), tails differ."""
        lang = self._lang()
        base = self._words(120)
        head = self._text_from(base, lines=60)
        cid = self.class_id = self.class_id + 1
        tail_a = " ".join(self._fresh_words(30, set(base)))
        tail_b = " ".join(self._fresh_words(30, set(base)))
        self._emit(head + "\n" + tail_a, lang, "trunc_pair", cid)
        self._emit(head + "\n" + tail_b, lang, "trunc_pair", cid)

    def emit_boiler(self, n: int):
        template = self._words(150)
        cid = self.class_id = self.class_id + 1
        for _ in range(n):
            if len(self.rows) >= self.n_docs:
                return
            payload = self._fresh_words(5, set(template))
            words = np.concatenate([template, payload])
            self._emit(
                self._text_from(words, lines=8),
                "en",
                "boilerplate_skew",
                cid,
                host=self.boiler_host,
                depth=1,
            )

    def emit_negative(self):
        cid = self.class_id = self.class_id + 1
        text = self._text_from(self._words(self.rng.randint(self.min_words, self.max_words)))
        self._emit(text, self._lang(), "negative", cid)

    def emit_crosslang_twin(self):
        """Same text, different lang — the same-type gate must keep them
        apart (main_cli.cpp:331, 638)."""
        cid = self.class_id = self.class_id + 1
        text = self._text_from(self._words(self.rng.randint(self.min_words, self.max_words)))
        l1, l2 = self.rng.choice(LANGS, size=2, replace=False)
        self._emit(text, l1, "crosslang_negative", cid)
        self._emit(text, l2, "crosslang_negative", cid)


def generate_pages(
    n_docs: int, seed: int = 42, min_words: int = 50, max_words: int = 300
) -> tuple[pd.DataFrame, pd.DataFrame]:
    b = _Builder(seed, n_docs, min_words, max_words)
    b.emit_boiler(max(4, int(n_docs * 0.07)))
    while len(b.rows) < n_docs:
        roll = b.rng.uniform()
        if roll < 0.10:
            b.emit_exact_group()
        elif roll < 0.20:
            b.emit_near_group("near_high", 0.80, 0.90, size=int(b.rng.randint(2, 4)))
        elif roll < 0.27:
            b.emit_near_group("near_borderline", 0.50, 0.70)
        elif roll < 0.32:
            b.emit_near_group("simhash_pair", 0.965, 0.99)
        elif roll < 0.35:
            b.emit_trunc_pair()
        elif roll < 0.40:
            b.emit_crosslang_twin()
        else:
            b.emit_negative()
    rows = b.rows[:n_docs]
    truth = b.truth[:n_docs]
    pages = pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])
    truth_df = pd.DataFrame(truth, columns=["url", "class_id", "class_kind"])
    # url-sorted = deterministic "scan order" both sides agree on
    order = pages["url"].argsort().to_numpy()
    return pages.iloc[order].reset_index(drop=True), truth_df.iloc[order].reset_index(
        drop=True
    )


def write_pages(out_dir: str, n_docs: int, seed: int = 42, **kw) -> tuple[str, str]:
    import pyarrow as pa
    import pyarrow.parquet as pq
    import os

    pages, truth = generate_pages(n_docs, seed, **kw)
    os.makedirs(out_dir, exist_ok=True)
    pages_path = f"{out_dir}/pages.parquet"
    truth_path = f"{out_dir}/pages_truth.parquet"
    schema = pa.schema(
        [
            ("url", pa.string()),
            ("warc_ts", pa.timestamp("us", tz="UTC")),
            ("html", pa.binary()),
            ("text", pa.string()),
            ("lang", pa.string()),
        ]
    )
    # small row groups: a single-row-group file can only be scanned by ONE
    # Spark task (byte-range splits beyond the first read zero rows), which
    # serializes extraction no matter the parallelism. 2k-row groups
    # (~4 MB at bench doc sizes) are finer than maxPartitionBytes, so
    # byte-range splits land >= core-count scan partitions and the fused
    # extract+signature UDF parallelizes WITHOUT a raw-page repartition
    # shuffle (8k groups left a 50k-doc file at 7 partitions — under the
    # repartition threshold, forcing a 122 MB shuffle before the UDF).
    pq.write_table(
        pa.Table.from_pandas(pages, schema=schema, preserve_index=False),
        pages_path,
        row_group_size=2048,
    )
    pq.write_table(
        pa.Table.from_pandas(truth, preserve_index=False),
        truth_path,
        row_group_size=2048,
    )
    return pages_path, truth_path
