"""SnapshotTable — Iceberg-style versioned table over plain parquet.

The north rule operates "over Iceberg snapshots" (BASELINE.json); no Iceberg
runtime jar ships in this sandbox, so this provides the same snapshot
CONTRACT with parquet + JSON manifests (the fallback SURVEY.md §7 step 1
records):

  * every commit (append / overwrite) writes its data files into a fresh
    immutable directory and then publishes a manifest ``v{n}.json`` listing
    the snapshot's COMPLETE file set — readers never list the data directory;
  * manifest publication is atomic (tmp + rename); a torn write can lose a
    commit but never corrupt one — exactly Iceberg's visibility rule;
  * ``read(spark, snapshot_id=k)`` is time travel: it plans a scan over
    exactly v_k's files, immune to later commits;
  * ``rollback(k)`` publishes a new manifest with v_k's file set (history is
    never rewritten — rollback is itself a commit, like Iceberg);
  * each manifest carries lineage: parent id, operation, row/file counts,
    and a content fingerprint — the "snapshot id" the engine's checkpoint
    store (checkpoint.py) and bucket manifests reference.

At 100 TB the only state on the hot path is the manifest JSON (KBs); data
file listings never hit the object store's slow LIST operation.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from typing import Optional

from pyspark.sql import DataFrame, SparkSession


class SnapshotTable:
    """Versioned parquet table rooted at ``path`` (created lazily)."""

    def __init__(self, path: str):
        self.path = path
        self._manifest_dir = os.path.join(path, "manifests")
        self._data_dir = os.path.join(path, "data")
        os.makedirs(self._manifest_dir, exist_ok=True)
        os.makedirs(self._data_dir, exist_ok=True)

    # ------------------------------------------------------------- manifests
    def _versions(self) -> list[int]:
        out = []
        for f in os.listdir(self._manifest_dir):
            if f.startswith("v") and f.endswith(".json"):
                try:
                    out.append(int(f[1:-5]))
                except ValueError:
                    continue
        return sorted(out)

    def _load(self, version: int) -> dict:
        with open(os.path.join(self._manifest_dir, f"v{version}.json")) as fh:
            return json.load(fh)

    def _publish(self, manifest: dict) -> int:
        """Atomic exclusive commit. ``os.link`` (unlike ``os.replace``)
        FAILS if the target manifest already exists, so two concurrent
        committers cannot both claim the same version — the loser recomputes
        the next version and retries, which is Iceberg's atomic-swap rule
        (on an object store this maps to a conditional/if-none-match put)."""
        while True:
            version = (self._versions()[-1] + 1) if self._versions() else 1
            manifest["version"] = version
            name = f"v{version}.json"
            tmp = os.path.join(self._manifest_dir, f".{name}.{os.getpid()}.tmp")
            with open(tmp, "w") as fh:
                json.dump(manifest, fh, indent=1)
                fh.flush()
                os.fsync(fh.fileno())
            try:
                os.link(tmp, os.path.join(self._manifest_dir, name))
                os.remove(tmp)
                return version
            except FileExistsError:
                os.remove(tmp)  # lost the race — retry at the next version

    def snapshots(self) -> list[dict]:
        """Full lineage log, oldest first."""
        return [self._load(v) for v in self._versions()]

    def current_version(self) -> Optional[int]:
        vs = self._versions()
        return vs[-1] if vs else None

    # ----------------------------------------------------------------- write
    def write(
        self, df: DataFrame, mode: str = "append", meta: Optional[dict] = None
    ) -> int:
        """Commit ``df`` as a new snapshot; returns the new version number.

        ``mode='append'``: new snapshot = parent's files + this commit's
        files. ``mode='overwrite'``: new snapshot = this commit's files only
        (old data files stay on disk — old snapshots remain readable).

        ``meta``: free-form JSON-serializable commit metadata recorded in
        the manifest under ``"meta"`` (Iceberg snapshot-summary contract) —
        e.g. a streaming micro-batch id, which makes replayed commits
        DETECTABLE and therefore idempotent (:meth:`version_with_meta`).
        """
        if mode not in ("append", "overwrite"):
            raise ValueError("mode must be 'append' or 'overwrite'")
        parent = self.current_version()
        commit_dir = os.path.join(
            self._data_dir, f"commit-{parent or 0}-{int(time.time() * 1e6)}"
        )
        df.write.mode("error").parquet(commit_dir)
        new_files = sorted(
            os.path.join(commit_dir, f)
            for f in os.listdir(commit_dir)
            if f.endswith(".parquet")
        )
        files = list(new_files)
        if mode == "append" and parent is not None:
            files = self._load(parent)["files"] + files
        fingerprint = hashlib.sha256("\n".join(sorted(files)).encode()).hexdigest()[:16]
        manifest = {
            "parent": parent,
            "operation": mode,
            "files": files,
            "n_files": len(files),
            "snapshot_id": f"snap-{fingerprint}",
            "committed_at": time.time(),
        }
        if meta:
            manifest["meta"] = meta
        return self._publish(manifest)

    def version_with_meta(self, key: str, value) -> Optional[int]:
        """The LATEST version whose manifest ``meta`` has ``key == value``
        (None if no commit carries it). This is the idempotent-replay
        probe: a streaming sink tags each commit with its micro-batch id
        and skips work whose commit already landed."""
        for v in reversed(self._versions()):
            if self._load(v).get("meta", {}).get(key) == value:
                return v
        return None

    def register(self, files: list[str]) -> int:
        """Iceberg ``add_files``-style commit: publish EXISTING parquet files
        as a new snapshot without rewriting any data. The manifest is the
        unit of planning — at 100 TB, registering a landed batch is a
        metadata-only operation."""
        files = sorted(files)
        if not files:
            raise ValueError("register() needs at least one file")
        missing = [f for f in files if not os.path.exists(f)]
        if missing:
            raise FileNotFoundError(f"missing data files: {missing[:3]}")
        fingerprint = hashlib.sha256("\n".join(files).encode()).hexdigest()[:16]
        return self._publish(
            {
                "parent": self.current_version(),
                "operation": "register",
                "files": files,
                "n_files": len(files),
                "snapshot_id": f"snap-{fingerprint}",
                "committed_at": time.time(),
            }
        )

    def rollback(self, version: int) -> int:
        """Publish a NEW snapshot with an old version's exact file set
        (history preserved; Iceberg rollback semantics)."""
        old = self._load(version)
        return self._publish(
            {
                "parent": self.current_version(),
                "operation": f"rollback-to-v{version}",
                "files": old["files"],
                "n_files": old["n_files"],
                "snapshot_id": old["snapshot_id"],
                "committed_at": time.time(),
            }
        )

    # ------------------------------------------------------------------ read
    def read(self, spark: SparkSession, version: Optional[int] = None) -> DataFrame:
        """Scan exactly one snapshot's file set (latest if unspecified)."""
        version = version if version is not None else self.current_version()
        if version is None:
            raise ValueError("table has no snapshots yet")
        files = self._load(version)["files"]
        if not files:
            raise ValueError(f"snapshot v{version} is empty")
        return spark.read.parquet(*files)

    def snapshot_id(self, version: Optional[int] = None) -> str:
        version = version if version is not None else self.current_version()
        return self._load(version)["snapshot_id"]

    # ----------------------------------------------------------- incremental
    def diff_files(self, from_version: int, to_version: Optional[int] = None) -> list[str]:
        """Data files visible at ``to_version`` but not at ``from_version`` —
        the planning set for an incremental scan. Metadata-only (two
        manifest reads), no data I/O."""
        to_version = to_version if to_version is not None else self.current_version()
        if to_version is None:
            raise ValueError("table has no snapshots yet")
        base = set(self._load(from_version)["files"])
        return [f for f in self._load(to_version)["files"] if f not in base]

    def compact(
        self,
        spark: SparkSession,
        zorder_cols: Optional[list[str]] = None,
        num_files: Optional[int] = None,
        bits: int = 16,
    ) -> int:
        """Compaction rewrite (Iceberg/Delta ``OPTIMIZE [ZORDER BY]``): read
        the current snapshot, rewrite it as ``num_files`` files — range-
        partitioned by the Morton key of ``zorder_cols`` when given, so
        each output file covers a small hyper-rectangle of the interleaved
        columns and file-level min/max statistics prune on ANY of them —
        and commit as an ``overwrite`` snapshot. Old snapshots stay
        readable (time travel is untouched); the commit's ``meta`` records
        the layout so downstream jobs can verify what they are scanning.

        Small-file compaction is THE table-maintenance operation at 100 TB:
        streaming/incremental commits accrete kilobyte files whose
        per-file open cost dominates scans; one range-shuffled rewrite
        restores scan bandwidth and adds multi-column pruning.
        """
        if self.current_version() is None:
            raise ValueError("compact: table has no snapshots yet")
        df = self.read(spark)
        meta: dict = {"operation_detail": "compact"}
        if zorder_cols:
            from temporalscope_spark.operators.layout import zorder_layout

            df = zorder_layout(df, zorder_cols, bits=bits, num_partitions=num_files)
            meta["zorder"] = list(zorder_cols)
            meta["zorder_bits"] = bits
        elif num_files is not None:
            df = df.repartition(num_files)
        if num_files is not None:
            meta["target_files"] = num_files
        return self.write(df, mode="overwrite", meta=meta)

    def read_increment(
        self,
        spark: SparkSession,
        from_version: int,
        to_version: Optional[int] = None,
    ) -> DataFrame:
        """Incremental APPEND scan (Iceberg's incremental read): exactly the
        rows committed after ``from_version``, up to ``to_version`` — the
        primitive that turns the feature pass into an incremental pipeline
        (process only the batch that landed since the last checkpointed
        snapshot, instead of rescanning 100 TB).

        Only valid over append-shaped lineage: every commit in the range
        must carry its parent's files forward (``append``, or a
        ``register``/rollback whose file set is a superset of the
        parent's). An overwrite in the range REMOVES rows, which a file
        diff cannot represent — that raises instead of silently returning
        wrong rows, matching Iceberg's incremental-scan restriction.

        Returns an empty-but-schemed DataFrame when nothing landed (read
        from the target snapshot with an always-false filter, so callers
        need no special case)."""
        to_version = to_version if to_version is not None else self.current_version()
        if to_version is None:
            raise ValueError("table has no snapshots yet")
        if to_version < from_version:
            raise ValueError(
                f"to_version v{to_version} precedes from_version v{from_version}"
            )
        # append-lineage gate: each snapshot in (from, to] must be a
        # superset of its parent (manifests are tiny — this is metadata-only)
        prev = set(self._load(from_version)["files"])
        for v in [x for x in self._versions() if from_version < x <= to_version]:
            man = self._load(v)
            cur = set(man["files"])
            if not prev.issubset(cur):
                raise ValueError(
                    f"snapshot v{v} ({man['operation']}) is not an append over "
                    f"its predecessor — incremental read is undefined across "
                    "overwrites/rollbacks; run a full recompute from that snapshot"
                )
            prev = cur
        added = self.diff_files(from_version, to_version)
        if not added:
            from pyspark.sql import functions as F  # noqa: PLC0415

            return self.read(spark, to_version).filter(F.lit(False))
        return spark.read.parquet(*added)

    # ------------------------------------------------------- copy-on-write
    @staticmethod
    def _norm_hit(files: list[str], rows) -> list[str]:
        """Map collected ``input_file_name()`` URIs back onto manifest
        paths (local ``file:`` URIs vs plain paths)."""
        from urllib.parse import urlparse

        norm = {os.path.abspath(urlparse(r["_file"]).path) for r in rows}
        return [f for f in files if os.path.abspath(f) in norm]

    def _hit_files(self, spark: SparkSession, files: list[str], marker) -> list[str]:
        """Data files containing at least one row where ``marker`` (a
        boolean Column) is true. One narrow scan (filter + distinct file
        name — no shuffle of the fat side beyond the distinct on ≤n_files
        values); returns manifest-normalized paths."""
        from pyspark.sql import functions as F  # noqa: PLC0415

        hit = (
            spark.read.parquet(*files)
            .withColumn("_file", F.input_file_name())
            .filter(marker)
            .select("_file")
            .distinct()
            .collect()
        )
        return self._norm_hit(files, hit)

    def _key_hit_files(
        self, spark: SparkSession, files: list[str], keys: DataFrame, key_cols: list[str]
    ) -> list[str]:
        """Data files containing at least one row whose key appears in the
        (batch-sized, broadcast) ``keys`` table — the planning set of a
        copy-on-write merge/purge."""
        from pyspark.sql import functions as F  # noqa: PLC0415

        hit = (
            spark.read.parquet(*files)
            .withColumn("_file", F.input_file_name())  # BEFORE the join —
            # file provenance must bind to the scan, not the join output
            .join(F.broadcast(keys), key_cols, "left_semi")
            .select("_file")
            .distinct()
            .collect()
        )
        return self._norm_hit(files, hit)

    def _cow_commit(
        self,
        spark: SparkSession,
        operation: str,
        hit_files: list[str],
        rewrite_df: Optional[DataFrame],
        meta: Optional[dict] = None,
    ) -> int:
        """Publish a copy-on-write snapshot: untouched files carry over BY
        REFERENCE; only ``hit_files`` are replaced by ``rewrite_df``'s
        output files. The write cost is proportional to the files actually
        touched — never to the table."""
        parent = self.current_version()
        files = [f for f in self._load(parent)["files"] if f not in set(hit_files)]
        new_files: list[str] = []
        if rewrite_df is not None:
            commit_dir = os.path.join(
                self._data_dir, f"commit-{parent}-{int(time.time() * 1e6)}"
            )
            rewrite_df.write.mode("error").parquet(commit_dir)
            new_files = sorted(
                os.path.join(commit_dir, f)
                for f in os.listdir(commit_dir)
                if f.endswith(".parquet")
            )
        files = files + new_files
        fingerprint = hashlib.sha256("\n".join(sorted(files)).encode()).hexdigest()[:16]
        manifest = {
            "parent": parent,
            "operation": operation,
            "files": files,
            "n_files": len(files),
            "snapshot_id": f"snap-{fingerprint}",
            "committed_at": time.time(),
            "meta": dict(meta or {}, rewritten_files=len(hit_files), added_files=len(new_files)),
        }
        return self._publish(manifest)

    def merge(
        self,
        spark: SparkSession,
        source: DataFrame,
        key_cols: list[str],
        meta: Optional[dict] = None,
    ) -> int:
        """``MERGE INTO`` (upsert): rows of ``source`` REPLACE target rows
        with the same key; unmatched source rows insert. File-granular
        copy-on-write, Iceberg's CoW MERGE shape:

        1. one narrow scan finds the data files containing matched keys
           (the source's key set is batch-sized — it broadcasts; the
           target side never shuffles);
        2. ONLY those files are rewritten (their rows minus matched keys),
           the source batch is appended into the same commit;
        3. every untouched file carries into the new manifest by
           reference — metadata only.

        Cost scales with touched files × file size + the batch, never with
        the table. Time travel is untouched: the pre-merge snapshot stays
        readable. Keys must be unique in ``source`` (enforced — a
        duplicate-key source would make "the" replacement row ambiguous).
        """
        from pyspark.sql import functions as F  # noqa: PLC0415

        if self.current_version() is None:
            raise ValueError("merge: table has no snapshots yet")
        if not key_cols:
            raise ValueError("merge: key_cols must be non-empty")
        dup = (
            source.groupBy(*key_cols)
            .count()
            .filter(F.col("count") > 1)
            .limit(1)
            .count()
        )
        if dup:
            raise ValueError("merge: source has duplicate keys")
        files = self._load(self.current_version())["files"]
        keys = source.select(*key_cols).distinct()
        hit_files = self._key_hit_files(spark, files, keys, key_cols)
        survivors = None
        if hit_files:
            survivors = spark.read.parquet(*hit_files).join(
                F.broadcast(keys), key_cols, "left_anti"
            )
        rewrite = (
            source
            if survivors is None
            else survivors.unionByName(source.select(*survivors.columns))
        )
        return self._cow_commit(spark, "merge", hit_files, rewrite, meta)

    def delete_where(
        self,
        spark: SparkSession,
        predicate,
        meta: Optional[dict] = None,
    ) -> int:
        """``DELETE FROM ... WHERE predicate`` as a copy-on-write commit:
        only the files that CONTAIN matching rows are rewritten (minus
        those rows); everything else carries by reference. ``predicate``
        is a Column or SQL string; rows where it is NULL are KEPT (SQL
        DELETE semantics). A no-match delete still publishes a snapshot —
        the audit trail a data-governance pass needs."""
        from pyspark.sql import functions as F  # noqa: PLC0415

        if self.current_version() is None:
            raise ValueError("delete_where: table has no snapshots yet")
        pred = F.expr(predicate) if isinstance(predicate, str) else predicate
        files = self._load(self.current_version())["files"]
        hit_files = self._hit_files(spark, files, pred)
        rewrite = None
        if hit_files:
            rewrite = spark.read.parquet(*hit_files).filter(
                ~F.coalesce(pred, F.lit(False))
            )
        return self._cow_commit(spark, "delete", hit_files, rewrite, meta)

    def expire_snapshots(self, keep_last: int = 1) -> dict:
        """Iceberg ``expire_snapshots``: drop all but the newest
        ``keep_last`` manifests and PHYSICALLY DELETE every data file no
        surviving manifest references. This is the retention half of true
        erasure — :meth:`forget_keys` removes rows from the CURRENT
        snapshot, ``expire_snapshots`` then destroys the historical files
        still holding the purged bytes. Metadata-only planning (set algebra
        over manifest file lists); deletion cost is the orphan count.

        Returns ``{"kept_versions": [...], "expired_versions": [...],
        "deleted_files": n}``. Time travel to expired versions is gone by
        design; ``keep_last`` must be >= 1 (the current snapshot always
        survives).
        """
        if keep_last < 1:
            raise ValueError("expire_snapshots: keep_last must be >= 1")
        versions = self._versions()
        if not versions:
            raise ValueError("expire_snapshots: table has no snapshots yet")
        kept = versions[-keep_last:]
        expired = [v for v in versions if v not in kept]
        live = set()
        for v in kept:
            live.update(self._load(v)["files"])
        dead = set()
        for v in expired:
            dead.update(f for f in self._load(v)["files"] if f not in live)
        for f in sorted(dead):
            if os.path.exists(f):
                os.remove(f)
        for v in expired:
            os.remove(os.path.join(self._manifest_dir, f"v{v}.json"))
        return {
            "kept_versions": kept,
            "expired_versions": expired,
            "deleted_files": len(dead),
        }

    def forget_keys(
        self,
        spark: SparkSession,
        keys: DataFrame,
        key_cols: list[str],
        meta: Optional[dict] = None,
    ) -> int:
        """Right-to-be-forgotten pass: purge every row whose key appears in
        ``keys`` (an opt-out/takedown list — batch-sized, it broadcasts).
        Same file-granular copy-on-write as :meth:`delete_where`; the purge
        cost is proportional to the files the listed keys actually live in
        (bucketed/z-ordered layouts shrink that set to ~|keys| files).
        NOTE: older snapshots still reference the pre-purge files — full
        erasure = forget_keys + expiring the old snapshots' data files
        (Iceberg's ``expire_snapshots`` contract, deliberately a separate
        retention decision)."""
        from pyspark.sql import functions as F  # noqa: PLC0415

        if self.current_version() is None:
            raise ValueError("forget_keys: table has no snapshots yet")
        klist = keys.select(*key_cols).distinct()
        files = self._load(self.current_version())["files"]
        hit_files = self._key_hit_files(spark, files, klist, key_cols)
        rewrite = None
        if hit_files:
            rewrite = spark.read.parquet(*hit_files).join(
                F.broadcast(klist), key_cols, "left_anti"
            )
        return self._cow_commit(spark, "forget", hit_files, rewrite, meta)
