"""Deployment-path integration test: the pipeline must run via REAL
``spark-submit --py-files go_cdc_spark.zip`` (north_rule), with the
package provided ONLY by the zip — the submit runs from a foreign cwd
with a copied entry script, so any import leak from the repo checkout
would be caught."""

from __future__ import annotations

import os
import shutil
import subprocess
import sys
import zipfile

import pyspark


def _zip_package(dst: str) -> str:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    zpath = os.path.join(dst, "go_cdc_spark.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        pkg = os.path.join(repo, "go_cdc_spark")
        for root, _dirs, files in os.walk(pkg):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, repo))
    return zpath


def test_spark_submit_py_files_replay(spark, tmpdir_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # stage: log written by the test session; zip + copied entry script
    from go_cdc_spark import oracle, schemas
    from go_cdc_spark.genlog import LogSpec, write_segments
    from go_cdc_spark.sinks.lake import ParquetLakeTable

    log_dir = f"{tmpdir_path}/log"
    write_segments(spark, LogSpec(n_events=4_000, segment_events=1_000, seed=13), log_dir)
    zpath = _zip_package(tmpdir_path)
    entry = f"{tmpdir_path}/run_replay.py"
    shutil.copy(os.path.join(repo, "scripts", "run_replay.py"), entry)

    submit = os.path.join(pyspark.__path__[0], "bin", "spark-submit")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    r = subprocess.run(
        [
            submit, "--master", "local[4]",
            "--conf", "spark.sql.shuffle.partitions=8",
            "--conf", "spark.sql.session.timeZone=UTC",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zpath, entry,
            "--pipeline-id", "cli-test", "--log", log_dir,
            "--table", f"{tmpdir_path}/table",
            "--bookmarks", f"{tmpdir_path}/bm",
            "--n-buckets", "4", "--chunk-segments", "2", "--mode", "run",
        ],
        cwd=tmpdir_path, env=env, capture_output=True, text=True, timeout=420,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    # final state must equal the sequential oracle replay (content sha)
    t = ParquetLakeTable.load(spark, f"{tmpdir_path}/table")
    got = oracle.table_fingerprint(t.read().toPandas())
    want = oracle.table_fingerprint(
        oracle.replay_oracle(spark.read.parquet(log_dir).toPandas())
    )
    assert got == want
    # resumability: a second identical submit is a no-op (idempotent epochs)
    v_before = t.latest_version()
    r2 = subprocess.run(
        [
            submit, "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zpath, entry,
            "--pipeline-id", "cli-test", "--log", log_dir,
            "--table", f"{tmpdir_path}/table",
            "--bookmarks", f"{tmpdir_path}/bm",
            "--n-buckets", "4", "--chunk-segments", "2", "--mode", "run",
        ],
        cwd=tmpdir_path, env=env, capture_output=True, text=True, timeout=420,
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    t2 = ParquetLakeTable.load(spark, f"{tmpdir_path}/table")
    assert oracle.table_fingerprint(t2.read().toPandas()) == want
