"""Cluster-packaging test (north rule: ships as spark-submit --py-files).

Builds dist/temporalscope_spark.zip, launches the flagship resumable feature
pass through a real ``spark-submit`` subprocess on local[4], and checks the
per-bucket outputs + lineage manifests. A second submit must resume (skip all
completed buckets) without recomputing.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = [
    pytest.mark.skipif(
        shutil.which("spark-submit") is None, reason="spark-submit not on PATH"
    ),
    pytest.mark.slow,
]


@pytest.fixture(scope="module")
def tokenized_input(spark, tmp_path_factory):
    from temporalscope_spark.datasets.synthetic import generate_tokenized_sequences

    path = str(tmp_path_factory.mktemp("submit") / "tok")
    generate_tokenized_sequences(spark, num_rows=2000, num_docs=20).write.parquet(path)
    return path


def _submit(input_path: str, out: str, ckpt: str) -> subprocess.CompletedProcess:
    zip_path = os.path.join(REPO, "dist", "temporalscope_spark.zip")
    subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "build_pyfiles.py")],
        check=True, capture_output=True,
    )
    env = dict(os.environ)
    # keep the subprocess JVM small and isolated from the test session
    env.pop("SPARK_GRAFT_DRIVER_MEM", None)
    return subprocess.run(
        [
            "spark-submit",
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--conf", "spark.sql.session.timeZone=UTC",
            "--py-files", zip_path,
            os.path.join(REPO, "temporalscope_spark", "pipelines", "feature_pass.py"),
            "--input", input_path,
            "--output", out,
            "--checkpoint", ckpt,
            "--num-buckets", "4",
        ],
        env=env, capture_output=True, text=True, timeout=300,
    )


def test_spark_submit_pyfiles_runs_and_resumes(tokenized_input, tmp_path):
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    r1 = _submit(tokenized_input, out, ckpt)
    assert r1.returncode == 0, r1.stderr[-3000:]
    assert "'processed': 4" in r1.stdout and "'skipped': 0" in r1.stdout

    buckets = sorted(d for d in os.listdir(out) if d.startswith("bucket="))
    assert buckets == [f"bucket={i}" for i in range(4)]

    manifests = [f for f in os.listdir(ckpt) if f.startswith("bucket_")]
    assert len(manifests) == 4
    rec = json.load(open(os.path.join(ckpt, sorted(manifests)[0])))
    assert {"bucket", "bounds", "row_count", "snapshot_id"} <= set(rec)
    assert rec["row_count"] > 0

    # resume: all buckets already committed -> nothing recomputed
    r2 = _submit(tokenized_input, out, ckpt)
    assert r2.returncode == 0, r2.stderr[-3000:]
    assert "'processed': 0" in r2.stdout and "'skipped': 4" in r2.stdout
