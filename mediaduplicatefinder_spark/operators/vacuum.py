"""Snapshot-expiry / vacuum planner (E149): the garbage-collection
decision for versioned tables — Iceberg ``expire_snapshots`` +
``remove_orphan_files``, Delta ``VACUUM`` — as one deterministic
relation over two O(files) inputs, never the corpus.

Every versioned table the pipeline maintains (signature stores,
incremental ledgers, snapshot dedup outputs) keeps old files alive for
time travel; storage only shrinks when someone decides which files no
retained snapshot can reach. Getting this wrong in either direction is
the classic data-platform incident: delete too eagerly and time travel
(or a concurrent reader) breaks; never delete and the table doubles
every re-crawl.

Inputs:
- ``manifest``: (path, size_bytes, added_seq, deleted_seq) — the
  snapshot sequence number that added the file and the one that
  logically deleted it (NULL = still live). A file is REFERENCED by
  snapshot s iff added_seq <= s and (deleted_seq is NULL or
  s < deleted_seq).
- ``storage``: (path, size_bytes) — the physical file listing.

With retained snapshots = [current_seq - retain_last + 1, current_seq]
(``oldest_retained`` below), the full outer join on path classifies:

- ``live``      manifest-referenced by some retained snapshot, present
                -> keep;
- ``expired``   deleted at or before oldest_retained, present
                -> delete (no retained snapshot can reach it);
- ``orphan``    present in storage, never in the manifest (failed
                write, killed task) -> delete;
- ``missing``   manifest says a retained snapshot needs it, storage
                does not have it -> alert (corruption — a vacuum run
                must SURFACE this, never mask it).

Everything is integer comparisons after one path-keyed full outer
join; the DuckDB twin matches bit for bit.

Reference tie-in: none (no versioned storage); SURVEY §2 E-series
extension — with the compaction planner (E147) these are the two
maintenance decisions a 100 TB table needs on a schedule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def vacuum_plan(
    manifest: DataFrame,
    storage: DataFrame,
    current_seq: int,
    retain_last: int,
) -> DataFrame:
    """(path, size_bytes, added_seq, deleted_seq, status, action) for
    every path in manifest ∪ storage; ``status`` in live/expired/
    orphan/missing, ``action`` in keep/delete/alert."""
    oldest_retained = current_seq - retain_last + 1
    m = manifest.select(
        F.col("path").cast("string").alias("path"),
        F.col("size_bytes").cast("long").alias("m_size"),
        F.col("added_seq").cast("long").alias("added_seq"),
        F.col("deleted_seq").cast("long").alias("deleted_seq"),
    )
    s = storage.select(
        F.col("path").cast("string").alias("path"),
        F.col("size_bytes").cast("long").alias("s_size"),
        F.lit(1).alias("on_disk"),
    )
    j = m.join(s, "path", "full_outer")
    referenced = F.col("added_seq").isNotNull() & (
        F.col("deleted_seq").isNull()
        | (F.col("deleted_seq") > oldest_retained)
    )
    present = F.col("on_disk").isNotNull()
    status = (
        F.when(referenced & present, F.lit("live"))
        .when(referenced & ~present, F.lit("missing"))
        .when(~referenced & F.col("added_seq").isNotNull(), F.lit("expired"))
        .otherwise(F.lit("orphan"))
    )
    # an expired file already absent from storage needs no work
    action = (
        F.when(status == "live", F.lit("keep"))
        .when(status == "missing", F.lit("alert"))
        .when(~present, F.lit("none"))
        .otherwise(F.lit("delete"))
    )
    return j.select(
        "path",
        F.coalesce("m_size", "s_size").alias("size_bytes"),
        "added_seq",
        "deleted_seq",
        status.alias("status"),
        action.alias("action"),
    )


def vacuum_plan_sql(
    current_seq: int,
    retain_last: int,
    manifest_source: str = "manifest",
    storage_source: str = "storage",
) -> str:
    """DuckDB twin — same join, same referenced/present predicates."""
    oldest = current_seq - retain_last + 1
    return f"""WITH m AS (
  SELECT CAST(path AS VARCHAR) AS path,
         CAST(size_bytes AS BIGINT) AS m_size,
         CAST(added_seq AS BIGINT) AS added_seq,
         CAST(deleted_seq AS BIGINT) AS deleted_seq
  FROM {manifest_source}
),
s AS (
  SELECT CAST(path AS VARCHAR) AS path,
         CAST(size_bytes AS BIGINT) AS s_size,
         1 AS on_disk
  FROM {storage_source}
),
j AS (
  SELECT COALESCE(m.path, s.path) AS path, m_size, added_seq,
         deleted_seq, s_size, on_disk
  FROM m FULL OUTER JOIN s ON m.path = s.path
),
cls AS (
  SELECT path, COALESCE(m_size, s_size) AS size_bytes,
         added_seq, deleted_seq, on_disk,
         CASE
           WHEN added_seq IS NOT NULL
                AND (deleted_seq IS NULL OR deleted_seq > {oldest})
           THEN CASE WHEN on_disk IS NOT NULL THEN 'live'
                     ELSE 'missing' END
           WHEN added_seq IS NOT NULL THEN 'expired'
           ELSE 'orphan'
         END AS status
  FROM j
)
SELECT path, size_bytes, added_seq, deleted_seq, status,
       CASE WHEN status = 'live' THEN 'keep'
            WHEN status = 'missing' THEN 'alert'
            WHEN on_disk IS NULL THEN 'none'
            ELSE 'delete' END AS action
FROM cls"""
