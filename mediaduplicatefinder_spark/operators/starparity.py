"""Strict star-parity mode (SURVEY.md §2.6 C2, optional): reproduce the
reference's greedy star clustering EXACTLY, not just its pair set.

The reference scan (main_cli.cpp:629-705): walk files in scan order;
the first unprocessed file seeds a group; every LATER unprocessed
same-type file similar TO THE SEED joins and is marked processed
(members never re-seed, never join another group); size-1 groups are
discarded. Seed scores 1.0, member scores its seed-similarity
(main_cli.cpp:633-634, 683-684).

Distributed shape: connected components first (operators/clustering.py)
— every reference star is a subset of one component, because each
(seed, member) edge passed the same verify predicate. The replay then
runs per component in ``applyInPandas`` (components are small: near-dup
clusters, not the corpus), using the verified edge list as the
similarity oracle. Scan order = url order (the corpus contract,
datagen/pages.py).

This is exactly the "greedy group replay (strict-parity mode)" row of
SURVEY.md §2.11; golden-tested against oracle.dedup.similar_star_groups.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STAR_SCHEMA = (
    "url string, star_seed string, score double, lang string"
)


def _replay_component(pdf: pd.DataFrame) -> pd.DataFrame:
    """Greedy star replay over one component's verified edges — O(edges).

    pdf rows: (cluster_id, url_a, url_b, score, lang) — edges with
    url_a < url_b. Nodes = all endpoint urls, scanned in url order.

    Equivalence to the reference's O(n^2) scan (main_cli.cpp:629-705):
    a candidate joins a seed's group only if similar to the seed, i.e.
    only if a verified EDGE (seed, cand) exists — so scanning the
    seed's sorted adjacency list visits exactly the joiners the full
    node scan would. Any unprocessed node at the seed's turn has
    url > seed (earlier nodes always seeded and were marked), so the
    reference's "later in scan order" constraint is implied by
    `cand not in processed`; and every edge is same-lang by the F1
    candidate gate, so the same-type check is vacuous within a
    component. Total work: sum of degrees = 2|edges| — a 100k-node
    boilerplate chain replays in linear time instead of 10^10 probes
    (VERDICT r1 item 6)."""
    adj: dict[str, list[tuple[str, float]]] = {}
    lang_of: dict[str, str] = {}
    for r in pdf.itertuples():
        adj.setdefault(r.url_a, []).append((r.url_b, r.score))
        adj.setdefault(r.url_b, []).append((r.url_a, r.score))
        lang_of[r.url_a] = r.lang
        lang_of[r.url_b] = r.lang
    processed = set()
    out_url: list[str] = []
    out_seed: list[str] = []
    out_score: list[float] = []
    for seed in sorted(adj):
        if seed in processed:
            continue
        processed.add(seed)
        members = [(seed, 1.0)]
        for cand, score in sorted(adj[seed]):
            if cand in processed:
                continue
            members.append((cand, score))
            processed.add(cand)
        if len(members) > 1:  # size-1 groups discarded (F3)
            for url, score in members:
                out_url.append(url)
                out_seed.append(seed)
                out_score.append(score)
    return pd.DataFrame(
        {
            "url": out_url,
            "star_seed": out_seed,
            "score": out_score,
            "lang": [lang_of[u] for u in out_url],
        }
    )


def star_parity_groups(labels: DataFrame, edges: DataFrame) -> DataFrame:
    """labels(url, cluster_id) + verified similar edges(url_a, url_b,
    lang, score) -> star groups (url, star_seed, score, lang), exactly
    the reference's grouping given the same pair relation.

    One shuffle: edges keyed by the component of url_a (url_b is in the
    same component by construction), grouped with applyInPandas."""
    with_comp = edges.join(
        labels.select(F.col("url").alias("url_a"), "cluster_id"), "url_a"
    ).select("cluster_id", "url_a", "url_b", "score", "lang")
    return with_comp.groupBy("cluster_id").applyInPandas(
        lambda pdf: _replay_component(pdf), schema=STAR_SCHEMA
    )
