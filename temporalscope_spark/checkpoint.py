"""Checkpoint store: per-bucket lineage + metrics + resume.

North rule: "Each partition emits lineage (snapshot id, bucket bounds, row
counts) and metrics to a checkpoint store so a killed job resumes without
recomputing completed buckets" (BASELINE.json).

Implementation (app-level, SURVEY.md §4.2.4): a manifest directory holding
one JSON file per completed bucket, written ATOMICALLY (tmp + rename, which
is atomic on POSIX and object-store-safe via conditional puts in production).
On restart, completed bucket ids are loaded and skipped — the anti-join
against done work. The parquet+manifest layout emulates Iceberg snapshots in
this sandbox (no Iceberg runtime jar); the snapshot id is a deterministic
fingerprint of the input so a changed input invalidates old checkpoints.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from typing import Callable, Iterable, Optional

from pyspark.sql import DataFrame


class CheckpointStore:
    """Atomic per-bucket manifest store rooted at ``path``."""

    def __init__(self, path: str, snapshot_id: str | None = None):
        self.path = path
        os.makedirs(path, exist_ok=True)
        self.snapshot_id = snapshot_id
        if snapshot_id is not None:
            self._guard_snapshot(snapshot_id)

    def _guard_snapshot(self, snapshot_id: str) -> None:
        """Invalidate the store if it was built from a different input."""
        snap_file = os.path.join(self.path, "_snapshot.json")
        if os.path.exists(snap_file):
            with open(snap_file) as fh:
                prior = json.load(fh).get("snapshot_id")
            if prior != snapshot_id:
                for f in os.listdir(self.path):
                    os.remove(os.path.join(self.path, f))
        self._atomic_write("_snapshot.json", {"snapshot_id": snapshot_id})

    def _atomic_write(self, name: str, payload: dict) -> None:
        tmp = os.path.join(self.path, f".{name}.tmp")
        with open(tmp, "w") as fh:
            json.dump(payload, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, os.path.join(self.path, name))

    def record_bucket(
        self,
        bucket_id: int,
        bounds: tuple | None = None,
        row_count: int | None = None,
        metrics: dict | None = None,
    ) -> None:
        """Atomically mark ``bucket_id`` complete with its lineage record."""
        self._atomic_write(
            f"bucket_{bucket_id:06d}.json",
            {
                "bucket": bucket_id,
                "snapshot_id": self.snapshot_id,
                "bounds": [str(b) for b in bounds] if bounds else None,
                "row_count": row_count,
                "metrics": metrics or {},
                "completed_at": time.time(),
            },
        )

    def completed_buckets(self) -> set[int]:
        done = set()
        for f in os.listdir(self.path):
            if f.startswith("bucket_") and f.endswith(".json"):
                done.add(int(f[len("bucket_"):-len(".json")]))
        return done

    def bucket_record(self, bucket_id: int) -> Optional[dict]:
        p = os.path.join(self.path, f"bucket_{bucket_id:06d}.json")
        if not os.path.exists(p):
            return None
        with open(p) as fh:
            return json.load(fh)

    def clear(self) -> None:
        for f in os.listdir(self.path):
            os.remove(os.path.join(self.path, f))


def snapshot_fingerprint(*parts: str | int | float) -> str:
    """Deterministic snapshot id from input identity (path, row count, etc.)."""
    h = hashlib.sha256()
    for p in parts:
        h.update(str(p).encode())
        h.update(b"\x00")
    return h.hexdigest()[:16]


def run_resumable(
    buckets: Iterable[tuple[int, DataFrame]],
    process: Callable[[int, DataFrame], DataFrame],
    store: CheckpointStore,
    sink: Callable[[int, DataFrame], int] | None = None,
    output_path: str | None = None,
) -> dict:
    """Process buckets, skipping completed ones; record lineage after each.

    ``buckets`` yields (bucket_id, bucket_df); ``process`` transforms a
    bucket; ``sink`` materializes it and returns the row count (defaults to
    partitioned parquet under ``output_path/bucket=N`` — an idempotent
    overwrite, so a bucket killed MID-write is simply rewritten on resume;
    the manifest only records buckets whose write finished).
    """
    done = store.completed_buckets()
    stats = {"processed": 0, "skipped": 0, "rows": 0}
    for bucket_id, bdf in buckets:
        if bucket_id in done:
            stats["skipped"] += 1
            continue
        t0 = time.monotonic()
        out = process(bucket_id, bdf)
        if sink is not None:
            n = sink(bucket_id, out)
        elif output_path is not None:
            out.write.mode("overwrite").parquet(f"{output_path}/bucket={bucket_id}")
            n = -1  # count avoided: lineage row_count filled from metrics if provided
        else:
            n = out.count()
        store.record_bucket(
            bucket_id,
            row_count=n,
            metrics={"duration_sec": round(time.monotonic() - t0, 3)},
        )
        stats["processed"] += 1
        stats["rows"] += max(n, 0)
    return stats
