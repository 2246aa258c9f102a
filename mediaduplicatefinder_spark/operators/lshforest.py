"""LSH Forest top-k similarity search (E182): Bawa/Condie/Ganesan,
"LSH Forest: Self-Tuning Indexes for Similarity Search" (WWW'05) —
the TOP-K member of the MinHash-LSH family the engine ships (fixed
banding E2 answers "all pairs above θ"; the forest answers "the k
most similar to q" with NO threshold parameter, the paper's
self-tuning point: a near-exact duplicate matches at full prefix
depth, a loose paraphrase still surfaces at shallow depth instead of
falling below a fixed band's S-curve).

Construction (paper §3, relational form): L independent trees, each
owning K consecutive slots of the SAME MinHash signature the fixed
channel already computes (no extra signature pass). A doc's position
in tree l is the sequence of its K slot values; the index relation is
(doc, tree, depth d, prefix key = slots[0..d)) for d = 1..K. A query
descends each tree to its deepest non-empty matching prefix and
collects candidates bottom-up (paper's SYNCHASCEND); relationally:
candidates = prefix-join at every depth, keep each (q,c) pair's MAX
matching depth m (= the descent depth where c is first met), rank by
(m DESC, exact Jaccard DESC, id ASC) and take k — exactly the
paper's deepest-first retrieval with the exact-similarity re-rank
production systems (datasketch's MinHashLSHForest) bolt on.

P(prefix match at depth d) = J^d: depth is a geometric similarity
ladder, so ranking by max depth approximates ranking by J with
precision that sharpens as d grows — and the exact-Jaccard tiebreak
(on the verify stage's fold-32 token sets, one array_intersect per
surviving pair) removes the residual estimation noise.

Scale shape: the index relation is L·K rows per doc keyed by
(lang, tree, depth, key) — the same banding-shuffle family the fixed
channel pays, L·K ≈ 32 band rows vs b=32 bands, same order; the
prefix join is an equi hash join per depth (broadcast-able query
side); hot shallow prefixes are the boilerplate-bucket problem the
engine already meets with caps/salting — here shallow matches only
matter for pairs with NO deeper match, so a per-depth bucket cap is
recall-safe for any pair that matches one level deeper (documented
lever, not applied at test scale). Keys are '_'-joined decimal slot
values for twin exactness; production folds them (sigcore band fold)
to 8 bytes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mediaduplicatefinder_spark.oracle.lsh_sql import M64

FOREST_TREES = 4
FOREST_DEPTH = 8


def _prefix_rows(
    sigs: DataFrame, n_trees: int, depth: int
) -> DataFrame:
    """signature rows -> (url, lang, tree, depth, key): the forest
    index relation. Uses minhash slots [tree*depth, tree*depth+d)
    (0-based), key = '_'-joined decimal values."""
    td = F.explode(
        F.array(
            *[
                F.struct(F.lit(t).alias("tree"), F.lit(d).alias("depth"))
                for t in range(n_trees)
                for d in range(1, depth + 1)
            ]
        )
    ).alias("td")
    # zero-shingle docs have no signature (the pipeline's F3-adjacent
    # gate; matches the twin's doc_stats universe) — an empty minhash
    # would otherwise produce '' keys that all match each other
    rows = sigs.filter(F.col("n_shingles") > 0).select(
        "url", "lang", "minhash", td
    ).select(
        "url",
        "lang",
        F.col("td.tree").alias("tree"),
        F.col("td.depth").alias("depth"),
        F.concat_ws(
            "_",
            F.transform(
                F.slice(
                    "minhash",
                    F.col("td.tree") * depth + 1,
                    F.col("td.depth"),
                ),
                lambda x: x.cast("string"),
            ),
        ).alias("key"),
    )
    return rows


def lshforest_topk(
    sigs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_trees: int = FOREST_TREES,
    depth: int = FOREST_DEPTH,
) -> DataFrame:
    """sigs = signature table (compute_signatures, include_minhash);
    queries(url) = the query subset (must be sig rows). Returns
    (url_q, url_c, depth, jaccard, rank): per query the top-k corpus
    docs (self excluded) by (max matching prefix depth DESC, exact
    fold-32 Jaccard DESC, url ASC)."""
    idx = _prefix_rows(sigs, n_trees, depth)
    qrows = idx.join(F.broadcast(queries.select("url")), "url").select(
        F.col("url").alias("url_q"), "lang", "tree", "depth", "key"
    )
    matches = (
        qrows.join(
            idx.select(
                F.col("url").alias("url_c"), "lang", "tree", "depth", "key"
            ),
            ["lang", "tree", "depth", "key"],
        )
        .filter(F.col("url_q") != F.col("url_c"))
        .groupBy("url_q", "url_c")
        .agg(F.max("depth").alias("m"))
    )
    toks = sigs.select("url", "token_hashes")
    scored = (
        matches.join(
            toks.select(
                F.col("url").alias("url_q"), F.col("token_hashes").alias("ta")
            ),
            "url_q",
        )
        .join(
            toks.select(
                F.col("url").alias("url_c"), F.col("token_hashes").alias("tb")
            ),
            "url_c",
        )
        .select(
            "url_q",
            "url_c",
            "m",
            (
                F.size(F.array_intersect("ta", "tb")).cast("double")
                / (
                    F.size("ta")
                    + F.size("tb")
                    - F.size(F.array_intersect("ta", "tb"))
                )
            ).alias("jaccard"),
        )
    )
    w = Window.partitionBy("url_q").orderBy(
        F.desc("m"), F.desc("jaccard"), F.asc("url_c")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "url_q",
            "url_c",
            F.col("m").cast("int").alias("depth"),
            "jaccard",
            F.col("rank").cast("int").alias("rank"),
        )
    )


def lshforest_tail_sql(
    query_pred: str,
    k: int = 5,
    n_trees: int = FOREST_TREES,
    depth: int = FOREST_DEPTH,
) -> str:
    """Oracle tail over lsh_base_cte's ``mh``/``fold``/``nfold``/
    ``doc_stats`` CTEs: the identical forest construction with SIGNED
    minhash values (the engine's int64 arrays) and fold-32 Jaccard.
    ``query_pred`` filters doc_stats urls to the query subset."""
    signed = (
        f"CASE WHEN mh >= 9223372036854775808 THEN (mh - {M64})::BIGINT "
        f"ELSE mh::BIGINT END"
    )
    return f"""
, mslots AS (
  SELECT url, (i // {depth}) AS tree, (i % {depth}) AS slot,
         {signed} AS m
  FROM mh WHERE i < {n_trees * depth}
),
depths(d) AS (SELECT unnest(generate_series(1, {depth}))),
fprefix AS MATERIALIZED (
  SELECT s.url, ds.lang, s.tree, dd.d AS depth,
         string_agg(s.m::VARCHAR, '_' ORDER BY s.slot) AS key
  FROM mslots s
  JOIN doc_stats ds ON ds.url = s.url
  JOIN depths dd ON s.slot < dd.d
  GROUP BY s.url, ds.lang, s.tree, dd.d
),
fq AS (SELECT * FROM fprefix WHERE {query_pred}),
fmatch AS (
  SELECT q.url AS url_q, c.url AS url_c, max(q.depth) AS m
  FROM fq q
  JOIN fprefix c ON c.lang = q.lang AND c.tree = q.tree
    AND c.depth = q.depth AND c.key = q.key AND c.url <> q.url
  GROUP BY q.url, c.url
),
fscored AS (
  SELECT f.url_q, f.url_c, f.m,
         coalesce(i.inter, 0)::DOUBLE
           / (na.nf + nb.nf - coalesce(i.inter, 0)) AS jaccard
  FROM fmatch f
  JOIN nfold na ON na.url = f.url_q
  JOIN nfold nb ON nb.url = f.url_c
  LEFT JOIN (
    SELECT f2.url_q, f2.url_c, count(*) AS inter
    FROM fmatch f2
    JOIN fold fa ON fa.url = f2.url_q
    JOIN fold fb ON fb.url = f2.url_c AND fb.f = fa.f
    GROUP BY f2.url_q, f2.url_c
  ) i ON i.url_q = f.url_q AND i.url_c = f.url_c
)
SELECT url_q, url_c, m::INT AS depth, jaccard, rn::INT AS rank
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY url_q ORDER BY m DESC, jaccard DESC, url_c
  ) AS rn
  FROM fscored
) WHERE rn <= {k}
"""
