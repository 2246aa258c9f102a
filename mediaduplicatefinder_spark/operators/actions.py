"""Deletion / quarantine executor (duplicate_gui.py:810-910).

The reference GUI's "Delete duplicates" button walks the duplicate
groups, keeps the highest-priority file per EXACT group, collects the
rest into a delete list with their byte sizes (missing file -> 0,
duplicate_gui.py:820-823), explicitly NEVER deletes SIMILAR matches
("Similar files will NOT be deleted", duplicate_gui.py:882), then
applies ``os.remove`` per file with per-file error capture and reports
"Deleted N files, freed <X GB|MB|KB>" (duplicate_gui.py:888-909).

Spark-native analog over a webtext corpus table:

- :func:`plan_actions` turns the clusters table into a declarative
  per-url action plan (keep / delete / flag) with ``bytes_reclaimed``.
  Pure DataFrame ops, SQL-oracleable (oracle/lsh_sql.dedup_actions_sql).
- :func:`deletion_report` is the confirm-dialog rollup: delete count,
  EXACT group count, total bytes, and the reference's exact GB/MB/KB
  ``space_str`` formatting (strict ``>`` thresholds, two decimals —
  duplicate_gui.py:864-870).
- :func:`apply_actions` executes the plan: quarantines the doomed rows
  to a parquet/Iceberg side table (the distributed analog of moving
  files to trash — reversible, auditable), returns the cleaned corpus
  via a broadcast anti-join, and reports per-url errors (plan urls
  absent from the corpus = the ``os.remove`` failure branch,
  duplicate_gui.py:891-896).

Scale: the plan is O(clustered urls) << O(corpus); the join that prices
deletions ships only (url, n_bytes). ``apply_actions`` broadcasts the
delete set so the corpus-side anti-join is shuffle-free — at 10^12 docs
the corpus never moves, only the (small) delete list does. When the
delete set outgrows the broadcast threshold Spark falls back to a
sort-merge anti-join on url, still one exchange of narrow keys.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GB = 1024**3
MB = 1024**2
KB = 1024


def space_str_expr(nbytes: Column) -> Column:
    """The reference's size formatter (duplicate_gui.py:864-870): strict
    ``>`` thresholds, two decimals, GB -> MB -> KB (never plain bytes)."""
    b = nbytes.cast("double")
    return (
        F.when(nbytes > F.lit(GB), F.format_string("%.2f GB", b / F.lit(float(GB))))
        .when(nbytes > F.lit(MB), F.format_string("%.2f MB", b / F.lit(float(MB))))
        .otherwise(F.format_string("%.2f KB", b / F.lit(float(KB))))
    )


def format_space(nbytes: int) -> str:
    """Driver-side twin of :func:`space_str_expr` for summaries."""
    if nbytes > GB:
        return f"{nbytes / GB:.2f} GB"
    if nbytes > MB:
        return f"{nbytes / MB:.2f} MB"
    return f"{nbytes / KB:.2f} KB"


def plan_actions(clusters: DataFrame, corpus: DataFrame) -> DataFrame:
    """clusters(url, cluster_id, kind, is_keeper) x corpus(url, text) ->
    (url, cluster_id, kind, action, bytes_reclaimed).

    Actions mirror duplicate_gui.py:826-845: the keeper of every group
    is ``keep``; EXACT non-keepers are ``delete`` priced at their byte
    size (missing from the corpus -> 0, the ``os.path.getsize``
    fallback at :820-823); SIMILAR non-keepers are ``flag`` — surfaced
    but never deleted (:882) — priced 0.

    The corpus side is projected to (url, n_bytes) before the join, so
    the exchange ships ~16-byte rows, never text.
    """
    sizes = corpus.select(
        "url", F.octet_length("text").cast("long").alias("n_bytes")
    )
    is_keep = F.col("is_keeper")
    is_del = (~is_keep) & (F.col("kind") == "EXACT")
    return (
        clusters.select("url", "cluster_id", "kind", "is_keeper")
        .join(sizes, "url", "left")
        .select(
            "url",
            "cluster_id",
            "kind",
            F.when(is_keep, F.lit("keep"))
            .when(is_del, F.lit("delete"))
            .otherwise(F.lit("flag"))
            .alias("action"),
            F.when(is_del, F.coalesce(F.col("n_bytes"), F.lit(0)))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("bytes_reclaimed"),
        )
    )


def deletion_report(plan: DataFrame) -> DataFrame:
    """One-row confirm-dialog rollup (duplicate_gui.py:846-883):
    (total_to_delete, n_exact_groups, total_space_to_free, space_str)."""
    deleting = F.col("action") == "delete"
    agg = plan.agg(
        F.count_if(deleting).alias("total_to_delete"),
        F.count_distinct(
            F.when(F.col("kind") == "EXACT", F.col("cluster_id"))
        ).alias("n_exact_groups"),
        F.coalesce(F.sum(F.when(deleting, F.col("bytes_reclaimed"))), F.lit(0))
        .cast("long")
        .alias("total_space_to_free"),
    )
    return agg.select(
        "total_to_delete",
        "n_exact_groups",
        "total_space_to_free",
        space_str_expr(F.col("total_space_to_free")).alias("space_str"),
    )


@dataclass(frozen=True)
class ApplyResult:
    """The reference's post-deletion report (duplicate_gui.py:898-909)."""

    clean: DataFrame
    deleted_count: int
    space_freed: int
    space_str: str
    errors: list[str]  # capped sample (error_sample_cap rows)
    error_count: int  # true total, counted distributed
    errors_df: DataFrame  # full error set, for a table/metrics sink


def apply_actions(
    corpus: DataFrame,
    plan: DataFrame,
    quarantine_path: str | None = None,
    error_sample_cap: int = 100,
) -> ApplyResult:
    """Execute the plan: quarantine doomed rows, return the clean corpus.

    - Rows whose url is in the delete set are written to
      ``quarantine_path`` (parquet) when given — the trash-can analog of
      ``os.remove`` that a 100 TB pipeline actually wants (reversible,
      auditable); pass ``None`` to skip the write (dry-run / the rows
      are simply dropped from the returned frame).
    - Plan urls absent from the corpus are the ``os.remove`` error
      branch (duplicate_gui.py:891-896): the full set stays distributed
      (``errors_df`` — sink it to a table/metrics store), the driver
      report gets only a ``limit(error_sample_cap)`` sample plus the
      distributed count. A stale plan against a re-crawled corpus can
      make the error set O(corpus); it must never be collected whole.
    - The clean corpus is a broadcast LEFT ANTI join on url: the corpus
      (the 100 TB side) is never shuffled.
    """
    deletions = plan.filter(F.col("action") == "delete").select(
        "url", "bytes_reclaimed"
    )
    # os.remove error analog: the planned url no longer exists
    errors_df = deletions.join(
        corpus.select("url"), "url", "left_anti"
    ).select("url")
    error_count = errors_df.count()
    errors = [
        f"{r.url}: not found"
        for r in errors_df.orderBy("url").limit(error_sample_cap).collect()
    ]
    doomed = corpus.join(F.broadcast(deletions.select("url")), "url", "left_semi")
    if quarantine_path is not None:
        doomed.write.mode("overwrite").parquet(quarantine_path)
    stats = (
        deletions.join(corpus.select("url"), "url", "left_semi")
        .agg(
            F.count("*").alias("n"),
            F.coalesce(F.sum("bytes_reclaimed"), F.lit(0)).alias("b"),
        )
        .collect()[0]
    )
    clean = corpus.join(F.broadcast(deletions.select("url")), "url", "left_anti")
    return ApplyResult(
        clean=clean,
        deleted_count=int(stats.n),
        space_freed=int(stats.b),
        space_str=format_space(int(stats.b)),
        errors=errors,
        error_count=int(error_count),
        errors_df=errors_df,
    )
