"""North-rule resumability: a KILLED (SIGKILL) feature-pass job must resume
from the checkpoint store without recomputing completed buckets.

A subprocess runs the resumable pipeline; the parent SIGKILLs its whole
process group as soon as the first bucket manifest lands, then finishes the
run in-process and asserts completed buckets were skipped and the output is
complete.
"""

from __future__ import annotations

import os
import signal
import subprocess
import sys
import time

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = """
import sys
sys.path.insert(0, {repo!r})
from temporalscope_spark.session import get_spark
from temporalscope_spark.datasets.synthetic import generate_tokenized_sequences
from temporalscope_spark.pipelines.feature_pass import run_pipeline

spark = get_spark("kill-child", master="local[2]", shuffle_partitions=2)
inp = {inp!r}
import os
if not os.path.exists(os.path.join(inp, "_SUCCESS")):
    generate_tokenized_sequences(spark, num_rows=3000, num_docs=30).write.mode(
        "overwrite"
    ).parquet(inp)
stats = run_pipeline(spark, inp, {out!r}, {ckpt!r}, num_buckets=6, pad_to=16)
print("CHILD_DONE", stats)
"""


@pytest.mark.timeout(420)
def test_sigkill_mid_run_then_resume(spark, tmp_path):
    inp = str(tmp_path / "tok")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    script = CHILD.format(repo=REPO, inp=inp, out=out, ckpt=ckpt)
    proc = subprocess.Popen(
        [sys.executable, "-c", script],
        stdout=subprocess.DEVNULL,
        stderr=subprocess.DEVNULL,
        start_new_session=True,  # own process group: the kill takes the JVM too
    )
    try:
        deadline = time.time() + 240
        n_manifests = 0
        while time.time() < deadline:
            if proc.poll() is not None:
                break  # finished before we could kill — still fine, resume is a no-op
            if os.path.isdir(ckpt):
                n_manifests = len(
                    [f for f in os.listdir(ckpt) if f.startswith("bucket_")]
                )
                # kill mid-run: some buckets committed, not all
                if 1 <= n_manifests <= 4:
                    os.killpg(proc.pid, signal.SIGKILL)
                    break
            time.sleep(0.1)
        else:
            pytest.fail("pipeline never produced a bucket manifest")
    finally:
        if proc.poll() is None:
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except ProcessLookupError:
                pass
        proc.wait(timeout=60)

    done_before = len([f for f in os.listdir(ckpt) if f.startswith("bucket_")])
    assert done_before >= 1

    # resume in-process: completed buckets skipped, remainder processed
    from temporalscope_spark.pipelines.feature_pass import run_pipeline

    stats = run_pipeline(spark, inp, out, ckpt, num_buckets=6, pad_to=16)
    assert stats["skipped"] == done_before
    assert stats["processed"] == 6 - done_before

    result = spark.read.parquet(out)
    assert result.count() > 0
    buckets = sorted(d for d in os.listdir(out) if d.startswith("bucket="))
    assert len(buckets) == 6
