"""SparkSession factory tuned for the sandbox (local[N], single JVM).

On a real cluster the same builder is used via ``spark-submit
--py-files``; only master/memory come from the submit environment.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _ensure_importable() -> None:
    """Make the package importable in driver AND python workers without a
    pip install (sandbox has no network): prepend the repo root to
    PYTHONPATH before the JVM forks python workers. On a real cluster
    this is replaced by ``spark-submit --py-files engine.zip``."""
    import sys

    if _REPO_ROOT not in sys.path:
        sys.path.insert(0, _REPO_ROOT)
    pp = os.environ.get("PYTHONPATH", "")
    if _REPO_ROOT not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            _REPO_ROOT + (os.pathsep + pp if pp else "")
        )


def get_spark(
    app_name: str = "mediaduplicatefinder-spark",
    parallelism: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    parallelism: local core count; None -> $SPARK_GRAFT_CPUS or all cores.
    """
    _ensure_importable()
    if parallelism is None:
        parallelism = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = max(parallelism, 8)

    builder = (
        SparkSession.builder.master(f"local[{parallelism}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(parallelism))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Shuffle/spill blocks live in tmpfs: the sandbox VM's disk
        # throughput is erratic under concurrent writers, and with 128 GiB
        # RAM the BENCH-scale shuffle working set always fits. A real
        # cluster keeps the default (executor-local SSDs).
        # CAVEAT (round-5 finding): tmpfs "spill to disk" consumes RAM —
        # at >= 500k-doc probe scale heap + tmpfs spill exceeds the VM
        # and the KERNEL OOM-kills the JVM (looks like GC churn). Large
        # jobs must export SPARK_LOCAL_DIRS to a real-disk path, as
        # scripts/flagship_scale_probe.py does; stale /dev/shm/
        # spark-local dirs from killed JVMs must be swept (71 GB of
        # leftovers were silently shrinking every earlier session's
        # usable RAM — the likely source of much "host contention").
        .config("spark.local.dir", os.environ.get("SPARK_LOCAL_DIRS", "/dev/shm/spark-local"))
        # Split single-file parquet scans into >= core-count partitions so
        # the extraction/signature UDFs parallelize WITHOUT a repartition
        # shuffle of the raw text/html bytes (a cluster reading thousands
        # of files doesn't need this; a local bench reading one file does).
        # 8m: a 122 MB bench file yields ~15 byte-range splits, which only
        # bite if row groups are finer still (datagen writes 2k-row groups).
        .config("spark.sql.files.maxPartitionBytes", "8m")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
