"""North-rule launch path: a REAL ``spark-submit --py-files`` run.

Launches scripts/submit_job.py through the actual spark-submit binary
with the package shipped ONLY via dist/engine.zip (PYTHONPATH scrubbed
from the child env), on a small synthetic corpus — the closest the
sandbox gets to the cluster submission the north rule specifies. A
broken zip layout, an import that sneaks past --py-files, or a job
that assumes driver-local code would all fail here.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="no spark-submit binary"
)
def test_spark_submit_pyfiles_end_to_end(spark, tmp_path):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import build_pyfiles

    zip_path = build_pyfiles.build(str(tmp_path / "engine.zip"))

    # small corpus with known duplicate structure, written by the
    # session fixture (the submitted job gets only the parquet path)
    from mediaduplicatefinder_spark.datagen.pages import generate_pages

    pages, _ = generate_pages(n_docs=120, seed=7, min_words=20, max_words=60)
    in_path = str(tmp_path / "pages.parquet")
    spark.createDataFrame(pages).write.parquet(in_path)
    out_dir = str(tmp_path / "out")

    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "SPARK_HOME")
    }
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    proc = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master",
            "local[4]",
            "--conf",
            "spark.sql.shuffle.partitions=8",
            "--py-files",
            zip_path,
            os.path.join(REPO, "scripts", "submit_job.py"),
            "--input",
            in_path,
            "--output",
            out_dir,
        ],
        capture_output=True,
        text=True,
        timeout=420,
        env=env,
        cwd=str(tmp_path),  # NOT the repo root: imports must come from the zip
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    result = None
    for line in proc.stdout.splitlines():
        try:
            cand = json.loads(line)
        except ValueError:
            continue
        if isinstance(cand, dict) and "n_pages" in cand:
            result = cand
    assert result is not None, proc.stdout[-2000:]
    assert result["n_pages"] == 120 and result["wall_sec"] > 0

    # outputs landed as parquet and agree with an in-session run
    clusters = spark.read.parquet(f"{out_dir}/clusters")
    from mediaduplicatefinder_spark.config import DEFAULT_CONFIG
    from mediaduplicatefinder_spark.pipeline import run_dedup

    local = run_dedup(spark, spark.read.parquet(in_path), DEFAULT_CONFIG)
    a = sorted(map(tuple, clusters.select("url", "cluster_id").collect()))
    b = sorted(
        map(tuple, local.clusters.select("url", "cluster_id").collect())
    )
    assert a == b  # submitted run == in-session run, row for row
