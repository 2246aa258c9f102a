"""Keeper selection (O1, duplicate_gui.py:650-658, 828-834).

Priority: (0, "") if the page sits directly under the scan root, else
(1, dirname); stable tie-break = url (scan order, since the corpus is
url-ordered by construction). One window per cluster — row_number()==1
is the keeper, the rest are redundant (deletion candidates).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mediaduplicatefinder_spark.functions.text import url_dirname_expr


def with_keeper_flags(clusters: DataFrame, scan_root: str = "") -> DataFrame:
    """clusters(url, cluster_id, ...) -> + (priority, dirname, keep_rank,
    is_keeper)."""
    dirname = url_dirname_expr("url")
    priority = F.when(dirname == F.lit(scan_root), F.lit(0)).otherwise(F.lit(1))
    sort_dir = F.when(dirname == F.lit(scan_root), F.lit("")).otherwise(dirname)
    # final tie-break on kind (EXACT < SIMILAR): a url that is both the
    # min of its sha group and its CC component's label yields two rows
    # with identical (priority, sort_dir, url) — without the tie-break
    # row_number() picks the keeper row nondeterministically
    order = ["priority", "sort_dir", "url"] + (
        ["kind"] if "kind" in clusters.columns else []
    )
    w = Window.partitionBy("cluster_id").orderBy(*order)
    return (
        clusters.withColumn("dirname", dirname)
        .withColumn("priority", priority)
        .withColumn("sort_dir", sort_dir)
        .withColumn("keep_rank", F.row_number().over(w))
        .withColumn("is_keeper", F.col("keep_rank") == 1)
        .drop("sort_dir")
    )


def keepers(clusters_flagged: DataFrame) -> DataFrame:
    return clusters_flagged.filter(F.col("is_keeper")).select("cluster_id", "url")


def redundant(clusters_flagged: DataFrame) -> DataFrame:
    """Deletion candidates — everything but the keeper
    (duplicate_gui.py:828-834)."""
    return clusters_flagged.filter(~F.col("is_keeper")).select(
        "cluster_id", "url", "kind"
    )
