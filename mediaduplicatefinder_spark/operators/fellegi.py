"""Fellegi-Sunter probabilistic record linkage with EM-fitted
parameters (E186): Fellegi & Sunter, "A Theory for Record Linkage"
(JASA 64, 1969); Winkler's EM fitting (Census SRD RR-88/05 1988);
the pattern-count formulation production systems ship (Splink,
ONS/MoJ — EM over the 2^K agreement-pattern contingency table, not
over raw pairs).

WHY in a dedup engine: every similarity channel the engine ships
emits a per-field signal (token Jaccard, size ratio, source, name
tokens), and the reference's dispatcher combines them with
hand-tuned thresholds (P14). Fellegi-Sunter is the PUBLISHED answer
to "how should multiple noisy agreement signals combine": model
match/unmatch as a two-class mixture, learn per-field agreement
probabilities m_k = P(agree|match), u_k = P(agree|unmatch) WITHOUT
LABELS via EM, and score each pair by its Bayes factor
Π (m/u)^g ((1−m)/(1−u))^(1−g) — the decision thresholds then have a
probabilistic meaning (posterior) instead of being magic numbers.

Distributed shape (the Splink insight, load-bearing at 10^12 docs):
pairs carry only their K-bit agreement PATTERN, so the sufficient
statistic for EM is the 2^K-row pattern-count contingency table —
ONE map-side-combining groupBy. EM then runs on 2^K counts
(driver-side, microseconds), and scoring joins a 2^K-row broadcast
table back to pairs. The corpus-scale work is exactly two hash
joins + two aggregations, independent of the number of EM
iterations.

Cross-engine determinism (the hard part, solved structurally):

- agreement fields are INTEGER cross-multiplied comparisons (2·inter
  > union; 5·min ≥ 4·max) — no float enters the pattern;
- EM is floating point, but every operation is made order-pinned:
  products are written left-associated in field order in BOTH
  engines, and every Σ over patterns is an ORDERED fold —
  Python iterates patterns in sorted() order, the SQL twin uses
  ``list_reduce(list(x ORDER BY pattern), +)`` — so engine-Python
  and twin-SQL produce bit-identical doubles (prototype-verified),
  and the driver gate value-checks posterior/Bayes-factor columns
  exactly;
- the engine runs EM in Python on the collected 2^K counts (they ARE
  driver-scale); the twin re-derives the identical EM unrolled as
  chained CTEs, so the whole fit — not just the scoring — is inside
  the oracle check.

Engine tokens are xxhash64-keyed, the twin intersects raw token
strings (the E108 collision-check pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_FIELDS = 4
EM_ITERS = 15
_EPS = 1e-6
_CAP = 1.0 - 1e-6


def _clamp(x: float) -> float:
    return min(max(x, _EPS), _CAP)


def fit_em(
    counts: dict[str, int], n_iter: int = EM_ITERS
) -> tuple[float, list[float], list[float]]:
    """EM over the pattern-count table. Patterns are K-char '0'/'1'
    strings. Returns (lam, m[0..K-1], u[0..K-1]). Every float op is
    order-pinned (sorted patterns, left-assoc products) to match the
    SQL twin bit-for-bit."""
    pats = sorted(counts)
    lam, m, u = 0.1, [0.9] * N_FIELDS, [0.1] * N_FIELDS
    for _ in range(n_iter):
        post = {}
        for p in pats:
            pm = lam
            pu = 1.0 - lam
            for k in range(N_FIELDS):
                if p[k] == "1":
                    pm = pm * m[k]
                    pu = pu * u[k]
                else:
                    pm = pm * (1.0 - m[k])
                    pu = pu * (1.0 - u[k])
            post[p] = pm / (pm + pu)
        den = 0.0
        for p in pats:
            den = den + counts[p] * post[p]
        denu = 0.0
        for p in pats:
            denu = denu + counts[p] * (1.0 - post[p])
        tot = 0.0
        for p in pats:
            tot = tot + float(counts[p])
        lam = _clamp(den / tot)
        new_m, new_u = [], []
        for k in range(N_FIELDS):
            num = 0.0
            for p in pats:
                if p[k] == "1":
                    num = num + counts[p] * post[p]
            numu = 0.0
            for p in pats:
                if p[k] == "1":
                    numu = numu + counts[p] * (1.0 - post[p])
            new_m.append(_clamp(num / den))
            new_u.append(_clamp(numu / denu))
        m, u = new_m, new_u
    return lam, m, u


def pattern_scores(
    counts: dict[str, int], n_iter: int = EM_ITERS
) -> list[tuple[str, float, float]]:
    """-> [(pattern, bayes_factor, posterior)] for every OBSERVED
    pattern, from the EM fit; products left-assoc in field order."""
    lam, m, u = fit_em(counts, n_iter)
    out = []
    for p in sorted(counts):
        bf = 1.0
        pm = lam
        pu = 1.0 - lam
        for k in range(N_FIELDS):
            if p[k] == "1":
                bf = bf * (m[k] / u[k])
                pm = pm * m[k]
                pu = pu * u[k]
            else:
                bf = bf * ((1.0 - m[k]) / (1.0 - u[k]))
                pm = pm * (1.0 - m[k])
                pu = pu * (1.0 - u[k])
        out.append((p, bf, pm / (pm + pu)))
    return out


def _features(docs: DataFrame) -> DataFrame:
    """(doc_id, lang, th sorted token-hash array, nc, src, ftok)."""
    from mediaduplicatefinder_spark.functions.text import tokens_expr

    return docs.select(
        "doc_id",
        "lang",
        F.array_sort(
            F.transform(tokens_expr(F.col("text")), lambda x: F.xxhash64(x))
        ).alias("th"),
        F.coalesce(F.col("n_chars"), F.lit(0)).alias("nc"),
        F.coalesce(F.col("source"), F.lit("")).alias("src"),
        F.coalesce(
            F.element_at(F.split(F.trim("text"), r"\s+"), 1), F.lit("")
        ).alias("ftok"),
    )


def fellegi_sunter(
    docs: DataFrame,
    n_iter: int = EM_ITERS,
    link_post: float = 0.95,
    possible_post: float = 0.5,
) -> DataFrame:
    """docs(doc_id, lang, text, n_chars, source) -> per same-lang pair
    (doc_a, doc_b, pattern, bayes_factor, posterior, decision).
    Fields: g1 token-Jaccard > 0.5 (2·inter > union, integer),
    g2 size ratio >= 0.8 (5·min >= 4·max), g3 same source,
    g4 same first whitespace token."""
    from mediaduplicatefinder_spark.operators.allpairs import blocked_pairs

    feats = _features(docs).persist()
    pairs = blocked_pairs(
        feats.select("doc_id", "lang"), "doc_id", group_cols=["lang"]
    ).select(
        F.col("doc_id_a").alias("doc_a"), F.col("doc_id_b").alias("doc_b")
    )
    fa = feats.select(
        F.col("doc_id").alias("doc_a"),
        F.col("th").alias("th_a"),
        F.col("nc").alias("nc_a"),
        F.col("src").alias("src_a"),
        F.col("ftok").alias("ftok_a"),
    )
    fb = feats.select(
        F.col("doc_id").alias("doc_b"),
        F.col("th").alias("th_b"),
        F.col("nc").alias("nc_b"),
        F.col("src").alias("src_b"),
        F.col("ftok").alias("ftok_b"),
    )
    inter = F.size(F.array_intersect("th_a", "th_b"))
    union = F.size("th_a") + F.size("th_b") - inter
    g1 = (2 * inter) > union
    g2 = (5 * F.least("nc_a", "nc_b")) >= (4 * F.greatest("nc_a", "nc_b"))
    g3 = F.col("src_a") == F.col("src_b")
    g4 = F.col("ftok_a") == F.col("ftok_b")
    pat = F.concat(
        *[
            F.when(g, F.lit("1")).otherwise(F.lit("0"))
            for g in (g1, g2, g3, g4)
        ]
    )
    patterned = (
        pairs.join(fa, "doc_a")
        .join(fb, "doc_b")
        .select("doc_a", "doc_b", pat.alias("pattern"))
        .persist()
    )
    counts = {
        r["pattern"]: r["cnt"]
        for r in patterned.groupBy("pattern")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }
    scores = pattern_scores(counts, n_iter)
    spark = docs.sparkSession
    # rounding happens in SPARK (F.round, HALF_UP like the twin's
    # round()) — python round() is banker's and would diverge at
    # exact .5e-6 boundaries
    score_df = spark.createDataFrame(
        [
            (
                p,
                float(bf),
                float(post),
                "link"
                if post >= link_post
                else ("possible" if post >= possible_post else "nonlink"),
            )
            for p, bf, post in scores
        ],
        "pattern string, bf_raw double, post_raw double, decision string",
    )
    out = patterned.join(F.broadcast(score_df), "pattern").select(
        "doc_a",
        "doc_b",
        "pattern",
        F.round("bf_raw", 6).alias("bayes_factor"),
        F.round("post_raw", 6).alias("posterior"),
        "decision",
    )
    feats.unpersist()
    return out


def fellegi_sunter_sql(
    n_iter: int = EM_ITERS,
    link_post: float = 0.95,
    possible_post: float = 0.5,
) -> str:
    """DuckDB twin over ``documents``: identical features/patterns
    (token STRINGS — the collision-check twin), the identical EM
    unrolled as chained CTEs with order-pinned arithmetic, identical
    per-pattern scoring."""

    def fold(expr: str) -> str:
        return (
            f"list_reduce(list(({expr})::DOUBLE ORDER BY pattern), "
            f"(a, b) -> a + b)"
        )

    def prod_chain(start: str, terms: list[str]) -> str:
        out = start
        for t in terms:
            out = f"({out} * {t})"
        return out

    def g(k: int) -> str:
        return f"g{k + 1}"

    # E-step expression factory over params row pp and pattern row
    def pm_expr() -> str:
        return prod_chain(
            "pp.lam",
            [
                f"(CASE WHEN {g(k)} THEN pp.m{k + 1} "
                f"ELSE (1.0 - pp.m{k + 1}) END)"
                for k in range(N_FIELDS)
            ],
        )

    def pu_expr() -> str:
        return prod_chain(
            "(1.0 - pp.lam)",
            [
                f"(CASE WHEN {g(k)} THEN pp.u{k + 1} "
                f"ELSE (1.0 - pp.u{k + 1}) END)"
                for k in range(N_FIELDS)
            ],
        )

    clamp = lambda x: f"least(greatest(({x}), {_EPS}), {_CAP!r})"  # noqa: E731

    em_ctes = []
    init_cols = ", ".join(
        ["0.1::DOUBLE AS lam"]
        + [f"0.9::DOUBLE AS m{k + 1}" for k in range(N_FIELDS)]
        + [f"0.1::DOUBLE AS u{k + 1}" for k in range(N_FIELDS)]
    )
    em_ctes.append(f"p0 AS (SELECT {init_cols})")
    for i in range(1, n_iter + 1):
        em_ctes.append(
            f"""po{i} AS (
  SELECT pat.*, ({pm_expr()}) / (({pm_expr()}) + ({pu_expr()})) AS post
  FROM pat, p{i - 1} pp
)"""
        )
        den = fold("cnt * post")
        denu = fold("cnt * (1.0 - post)")
        tot = fold("cnt")
        mk = [
            clamp(
                f"{fold(f'CASE WHEN {g(k)} THEN cnt * post ELSE 0.0 END')}"
                f" / ({den})"
            )
            for k in range(N_FIELDS)
        ]
        uk = [
            clamp(
                f"{fold(f'CASE WHEN {g(k)} THEN cnt * (1.0 - post) ELSE 0.0 END')}"
                f" / ({denu})"
            )
            for k in range(N_FIELDS)
        ]
        cols = ", ".join(
            [f"{clamp(f'({den}) / ({tot})')} AS lam"]
            + [f"{m} AS m{k + 1}" for k, m in enumerate(mk)]
            + [f"{u} AS u{k + 1}" for k, u in enumerate(uk)]
        )
        em_ctes.append(f"p{i} AS (SELECT {cols} FROM po{i})")

    bf = prod_chain(
        "1.0",
        [
            f"(CASE WHEN {g(k)} THEN (pp.m{k + 1} / pp.u{k + 1}) "
            f"ELSE ((1.0 - pp.m{k + 1}) / (1.0 - pp.u{k + 1})) END)"
            for k in range(N_FIELDS)
        ],
    )
    em_sql = ",\n".join(em_ctes)
    return f"""
WITH docs0 AS MATERIALIZED (
  SELECT doc_id, lang,
         list_sort(list_distinct(list_filter(
           string_split_regex(
             lower(regexp_replace(text, '[^a-zA-Z0-9 \\t\\n\\r\\f\\x0B]', '', 'g')),
             '[ \\t\\n\\r\\f\\x0B]+'), x -> len(x) > 2))) AS ts,
         coalesce(n_chars, 0) AS nc,
         coalesce(source, '') AS src,
         coalesce(string_split_regex(trim(text), '[ \\t\\n\\r\\f\\x0B]+')[1], '') AS ftok
  FROM documents
),
prs AS MATERIALIZED (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         concat(
           CASE WHEN 2 * len(list_intersect(a.ts, b.ts))
                     > (len(a.ts) + len(b.ts)
                        - len(list_intersect(a.ts, b.ts)))
                THEN '1' ELSE '0' END,
           CASE WHEN 5 * least(a.nc, b.nc) >= 4 * greatest(a.nc, b.nc)
                THEN '1' ELSE '0' END,
           CASE WHEN a.src = b.src THEN '1' ELSE '0' END,
           CASE WHEN a.ftok = b.ftok THEN '1' ELSE '0' END
         ) AS pattern
  FROM docs0 a JOIN docs0 b
    ON a.lang = b.lang AND a.doc_id < b.doc_id
),
pat AS MATERIALIZED (
  SELECT pattern,
         count(*)::BIGINT AS cnt,
         substring(pattern, 1, 1) = '1' AS g1,
         substring(pattern, 2, 1) = '1' AS g2,
         substring(pattern, 3, 1) = '1' AS g3,
         substring(pattern, 4, 1) = '1' AS g4
  FROM prs GROUP BY pattern
),
{em_sql},
scores AS (
  SELECT pat.pattern,
         round({bf}, 6) AS bayes_factor,
         round(({pm_expr()}) / (({pm_expr()}) + ({pu_expr()})), 6)
           AS posterior,
         CASE WHEN ({pm_expr()}) / (({pm_expr()}) + ({pu_expr()}))
                   >= {link_post!r} THEN 'link'
              WHEN ({pm_expr()}) / (({pm_expr()}) + ({pu_expr()}))
                   >= {possible_post!r} THEN 'possible'
              ELSE 'nonlink' END AS decision
  FROM pat, p{n_iter} pp
)
SELECT p.doc_a, p.doc_b, p.pattern, s.bayes_factor, s.posterior,
       s.decision
FROM prs p JOIN scores s USING (pattern)
"""
