"""Lakehouse catalog shim + checkpoint/resume (O9 at scale).

The at-scale deployment writes every stage checkpoint to Iceberg
(``writeTo(...).append()``); this sandbox has no Iceberg jars, so the shim
falls back to a parquet layout with a JSON manifest per table that records
completed partition buckets — the same contract the reference implements
with per-batch ``search_res.json`` existence checks + FileLock
(``src/deepex/data/re_data.py:166-201``, ``scripts/generator.py:164-166``).

Resume = ``left_anti`` join of the input's bucket ids against the
manifest's completed buckets: only pending buckets are recomputed, with
per-partition lineage (run_id, bucket, written_at) carried in both the
manifest and the rows.

A ``_metrics`` table accumulates per-stage row counts and wall times
(SURVEY.md §7.0 lineage/metrics requirement).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class Catalog:
    def __init__(self, base_dir: str, fmt: str = "parquet", spark: SparkSession | None = None):
        self.base_dir = base_dir
        self.fmt = fmt
        os.makedirs(base_dir, exist_ok=True)

    # -- paths ------------------------------------------------------------
    def path(self, table: str) -> str:
        return os.path.join(self.base_dir, table)

    def _manifest_path(self, table: str) -> str:
        return os.path.join(self.base_dir, f"_{table}_manifest.json")

    # -- IO ---------------------------------------------------------------
    def write(self, df: DataFrame, table: str, mode: str = "overwrite", partition_by=None):
        if self.fmt == "iceberg":  # pragma: no cover - jars absent in sandbox
            w = df.writeTo(table)
            (w.createOrReplace() if mode == "overwrite" else w.append())
            return
        if self._snapshot_manifest(table)["versions"]:
            # a plain write into a snapshot-versioned table would land in
            # the root while read() serves the current _vN — silently
            # invisible data. Fail loudly instead.
            raise ValueError(
                f"table {table!r} is snapshot-versioned — use write_snapshot()"
            )
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self.path(table))

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        if self.fmt == "iceberg":  # pragma: no cover
            return spark.read.format("iceberg").load(table)
        # snapshot-versioned tables serve the CURRENT version to plain
        # readers too — after a maintenance run migrates a table, every
        # existing read() consumer sees the merged data, not the stale
        # pre-migration root files
        if self._snapshot_manifest(table)["versions"]:
            return self.read_snapshot(spark, table)
        return spark.read.parquet(self.path(table))

    def exists(self, table: str) -> bool:
        return os.path.exists(self.path(table)) or os.path.exists(self._manifest_path(table))

    # -- checkpoint / resume ----------------------------------------------
    def completed_buckets(self, table: str) -> list[int]:
        mp = self._manifest_path(table)
        if not os.path.exists(mp):
            return []
        with open(mp) as f:
            manifest = json.load(f)
        return sorted(int(b) for b in manifest.get("buckets", {}))

    def checkpoint(
        self,
        df: DataFrame,
        table: str,
        bucket_col: str = "docid",
        n_buckets: int = 32,
        run_id: str = "run0",
    ) -> None:
        """Write df partitioned by pmod(xxhash64(bucket_col), n_buckets),
        skipping buckets already in the manifest (resume)."""
        if self._snapshot_manifest(table)["versions"]:
            # appending into the root of a versioned table would be
            # invisible to read() (which serves _vN) while the resume
            # manifest marks the buckets complete — silent data loss
            raise ValueError(
                f"table {table!r} is snapshot-versioned — checkpoint() "
                "appends to the plain layout; use a different table or "
                "write_snapshot()"
            )
        done = set(self.completed_buckets(table))
        bucketed = df.withColumn(
            "bucket", F.pmod(F.xxhash64(F.col(bucket_col)), F.lit(n_buckets)).cast("int")
        ).withColumn("run_id", F.lit(run_id))
        if done:
            bucketed = bucketed.filter(~F.col("bucket").isin(sorted(done)))
        bucketed.write.mode("append").partitionBy("bucket").parquet(self.path(table))
        now = time.time()
        mp = self._manifest_path(table)
        manifest = {"table": table, "n_buckets": n_buckets, "buckets": {}}
        if os.path.exists(mp):
            with open(mp) as f:
                manifest = json.load(f)
        for b in range(n_buckets):
            if b not in done:
                manifest["buckets"][str(b)] = {"run_id": run_id, "written_at": now}
        tmp = mp + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, mp)

    def pending(self, df: DataFrame, table: str, bucket_col: str = "docid", n_buckets: int = 32) -> DataFrame:
        """Rows of df whose bucket is NOT yet completed (anti-join resume)."""
        done = self.completed_buckets(table)
        bucketed = df.withColumn(
            "bucket", F.pmod(F.xxhash64(F.col(bucket_col)), F.lit(n_buckets)).cast("int")
        )
        if not done:
            return bucketed
        spark = df.sparkSession
        done_df = spark.createDataFrame([(b,) for b in done], "bucket int")
        return bucketed.join(F.broadcast(done_df), "bucket", "left_anti")

    # -- snapshots (time travel) -------------------------------------------
    def _snapshot_manifest_path(self, table: str) -> str:
        return os.path.join(self.base_dir, f"_{table}_snapshots.json")

    def _snapshot_manifest(self, table: str) -> dict:
        sp = self._snapshot_manifest_path(table)
        if not os.path.exists(sp):
            return {"table": table, "current": 0, "versions": {}}
        with open(sp) as f:
            return json.load(f)

    def _snapshot_lock(self, table: str):
        """Single-host exclusive lock for snapshot version allocation —
        the same FileLock discipline the reference uses for its per-batch
        result files (generator.py:164-166). Two concurrent maintenance
        jobs would otherwise allocate the SAME version number and write
        into one _vN directory simultaneously. Multi-host coordination is
        Iceberg's job (``fmt='iceberg'`` commits through the engine)."""
        import contextlib

        lock_path = self._snapshot_manifest_path(table) + ".lock"

        def _holder_dead() -> bool:
            """A lock whose recorded PID no longer exists is stale (the
            holder was SIGKILLed mid-publish) — break it so the documented
            same-run_id retry recovery can proceed instead of bricking."""
            try:
                with open(lock_path) as f:
                    pid = int(f.read().strip() or "0")
            except (OSError, ValueError):
                return False
            if pid <= 0:
                return False
            try:
                os.kill(pid, 0)
                return False
            except ProcessLookupError:
                return True
            except PermissionError:
                return False

        @contextlib.contextmanager
        def held():
            deadline = time.time() + 600  # > any sane snapshot write
            while True:
                try:
                    fd = os.open(lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                    os.write(fd, str(os.getpid()).encode())
                    break
                except FileExistsError:
                    if _holder_dead():
                        try:
                            os.unlink(lock_path)
                        except FileNotFoundError:
                            pass
                        continue
                    if time.time() > deadline:
                        raise TimeoutError(f"snapshot lock busy: {lock_path}")
                    time.sleep(0.2)
            try:
                yield
            finally:
                os.close(fd)
                os.unlink(lock_path)

        return held()

    def is_versioned(self, table: str) -> bool:
        return bool(self._snapshot_manifest(table)["versions"])

    def version_of_run(self, table: str, run_id: str) -> int | None:
        """Version a given run_id published to this table, or None."""
        for v, meta in self._snapshot_manifest(table)["versions"].items():
            if meta.get("run_id") == run_id:
                return int(v)
        return None

    def write_snapshot(
        self, df: DataFrame, table: str, partition_by=None, run_id: str | None = None
    ) -> int:
        """Iceberg-snapshot-style versioned overwrite for the parquet
        shim (write-audit-publish): data lands in ``<table>/_v<N>`` and
        the current-version pointer flips via ``os.replace`` only AFTER
        the write finishes — a reader of the current snapshot never sees
        a partial overwrite, and every prior version stays readable
        (``read_snapshot(..., version=K)``) until explicitly expired.
        This is what lets incremental KG maintenance publish a rebuilt
        vertices/edges table while queries keep running against the old
        one. ``run_id`` is recorded in the manifest so idempotent jobs
        (jobs/maintain_kg.py) can detect an already-applied batch and
        skip the re-merge on retry. Version allocation + publish run
        under a single-host file lock. With ``fmt='iceberg'`` the
        engine's own snapshot commit subsumes this (``VERSION AS OF``
        time travel). Returns the new version number."""
        if self.fmt == "iceberg":  # pragma: no cover - jars absent in sandbox
            df.writeTo(table).createOrReplace()
            return -1
        with self._snapshot_lock(table):
            man = self._snapshot_manifest(table)
            if run_id is not None:
                # idempotent publish: the run_id re-check happens INSIDE
                # the lock, so two racing jobs with the same run_id — even
                # one that re-read the table AFTER the other published —
                # cannot both land a merge (the classic check-then-act
                # double-apply)
                for v_str, meta in man["versions"].items():
                    if meta.get("run_id") == run_id:
                        return int(v_str)
                if run_id in man.get("expired_run_ids", []):
                    return int(man["current"])
            v = int(man["current"]) + 1
            w = df.write.mode("overwrite")
            if partition_by:
                w = w.partitionBy(*partition_by)
            w.parquet(os.path.join(self.path(table), f"_v{v}"))
            man["current"] = v
            man["versions"][str(v)] = {"written_at": time.time(), "run_id": run_id}
            sp = self._snapshot_manifest_path(table)
            tmp = sp + ".tmp"
            with open(tmp, "w") as f:
                json.dump(man, f)
            os.replace(tmp, sp)
        return v

    def snapshot_run_ids(self, table: str) -> set[str]:
        """run_ids already published to this table, INCLUDING runs whose
        version data has since been expired (history survives retention,
        so a stale retry of an old batch can never re-apply it)."""
        man = self._snapshot_manifest(table)
        live = {
            meta["run_id"] for meta in man["versions"].values() if meta.get("run_id")
        }
        return live | set(man.get("expired_run_ids", []))

    def read_snapshot(
        self, spark: SparkSession, table: str, version: int | None = None
    ) -> DataFrame:
        """Read a snapshot table at the current (default) or a pinned
        version — the shim's ``VERSION AS OF``."""
        if self.fmt == "iceberg":  # pragma: no cover
            r = spark.read.format("iceberg")
            if version is not None:
                r = r.option("snapshot-id", str(version))
            return r.load(table)
        man = self._snapshot_manifest(table)
        v = int(man["current"]) if version is None else int(version)
        if str(v) not in man["versions"]:
            raise ValueError(f"table {table!r} has no snapshot version {v}")
        return spark.read.parquet(os.path.join(self.path(table), f"_v{v}"))

    def expire_snapshots(self, table: str, keep: int = 2) -> list[int]:
        """Drop all but the newest ``keep`` versions (the current one is
        always kept) — the shim's ``expire_snapshots`` maintenance job.
        Manifest-first ordering: entries are removed and PERSISTED before
        any directory is deleted, so a crash mid-expire leaves only
        orphaned _vN dirs (harmless; swept by the next expire) — never a
        manifest pointing at deleted data. Returns the expired version
        numbers."""
        import shutil

        if self.fmt == "iceberg":  # pragma: no cover - jars absent in sandbox
            raise NotImplementedError(
                "expire_snapshots() manages the parquet shim's _vN layout; "
                "for an iceberg catalog use the engine's retention "
                "(CALL system.expire_snapshots)"
            )
        if keep < 1:
            raise ValueError("keep must be >= 1")
        with self._snapshot_lock(table):
            man = self._snapshot_manifest(table)
            versions = sorted(int(x) for x in man["versions"])
            drop = [v for v in versions[:-keep] if v != int(man["current"])]
            expired = set(man.get("expired_run_ids", []))
            for v in drop:
                rid = man["versions"][str(v)].get("run_id")
                if rid:
                    expired.add(rid)  # keep idempotency history past retention
                del man["versions"][str(v)]
            man["expired_run_ids"] = sorted(expired)
            sp = self._snapshot_manifest_path(table)
            tmp = sp + ".tmp"
            with open(tmp, "w") as f:
                json.dump(man, f)
            os.replace(tmp, sp)
            # delete dropped dirs + sweep orphans from earlier crashed
            # expires (on disk but absent from the manifest)
            base = self.path(table)
            live = {f"_v{x}" for x in man["versions"]}
            if os.path.isdir(base):
                for d in os.listdir(base):
                    if d.startswith("_v") and d not in live:
                        shutil.rmtree(os.path.join(base, d), ignore_errors=True)
        return drop

    # -- maintenance ------------------------------------------------------
    def compact(
        self,
        spark: SparkSession,
        table: str,
        target_bytes: int = 128 << 20,
    ) -> dict:
        """Small-file compaction for a (possibly bucket-partitioned)
        parquet table: rewrite every partition whose file count exceeds
        ``ceil(bytes / target_bytes)`` down to that many files.

        The small-file problem is the dominant operational failure of
        long-lived incremental tables at scale — every resume append adds
        (tasks x buckets) files, and a 100 TB table with millions of
        8 MB files spends more time in listing + open() than in IO.
        Compaction is value-neutral (read -> coalesce -> rewrite, no
        shuffle: coalesce only merges co-located splits), idempotent
        (re-running is a no-op once each partition is at target), and
        leaves the resume manifest untouched. Each partition swaps via
        rewrite-to-temp + rename; run it offline like any table
        maintenance job (readers racing the swap can see a partial
        partition — Iceberg's snapshot commit is the online answer, and
        the ``fmt='iceberg'`` catalog branch gets that for free).
        Returns ``{partition: (files_before, files_after)}``.
        """
        import math
        import shutil

        if self.fmt == "iceberg":  # pragma: no cover - jars absent in sandbox
            raise NotImplementedError(
                "compact() rewrites raw parquet partition dirs; for an "
                "iceberg catalog use the engine's snapshot-committing "
                "rewrite instead (CALL system.rewrite_data_files)"
            )
        base = self.path(table)
        # snapshot-versioned tables: compact the CURRENT version's
        # directory. The root of such a table holds the _vN dirs — the
        # wholesale root swap below would move (then rmtree) EVERY
        # snapshot, destroying the table.
        man = self._snapshot_manifest(table)
        if man["versions"]:
            base = os.path.join(base, f"_v{int(man['current'])}")
        parts = [d for d in sorted(os.listdir(base)) if d.startswith("bucket=")]
        report: dict[str, tuple[int, int]] = {}
        for d in parts or [""]:
            pdir = os.path.join(base, d) if d else base
            files = [f for f in os.listdir(pdir) if f.endswith(".parquet")]
            size = sum(os.path.getsize(os.path.join(pdir, f)) for f in files)
            n_out = max(1, math.ceil(size / target_bytes))
            if len(files) <= n_out:
                continue
            # temp dirs are SIBLINGS of the dir being swapped — never
            # inside it — and underscore-prefixed so a crash-left temp is
            # invisible to Spark's file listing / partition discovery.
            # mergeSchema: a long-lived incremental table may carry schema
            # drift across appended files; inferring from one footer would
            # silently drop later columns from the rewrite.
            tmp = os.path.join(os.path.dirname(pdir), f"_compact_{table}_{d or 'root'}")
            old = tmp + ".old"
            (
                spark.read.option("mergeSchema", "true")
                .parquet(pdir)
                .coalesce(n_out)
                .write.mode("overwrite")
                .parquet(tmp)
            )
            # swap order narrows the unreadable window to two renames
            # (microseconds, vs spanning a whole rmtree): live dir aside,
            # rewrite into place, THEN delete. A crash at any point leaves
            # the data intact under `pdir`, `old` or `tmp` — recoverable,
            # never silently lost.
            os.replace(pdir, old)
            os.replace(tmp, pdir)
            shutil.rmtree(old)
            report[d or "."] = (
                len(files),
                len([f for f in os.listdir(pdir) if f.endswith(".parquet")]),
            )
        return report

    # -- metrics ----------------------------------------------------------
    def log_metric(self, spark: SparkSession, stage: str, rows: int, wall_s: float, run_id: str = "run0"):
        df = spark.createDataFrame(
            [(run_id, stage, rows, float(wall_s), time.time())],
            "run_id string, stage string, rows long, wall_s double, ts double",
        )
        df.coalesce(1).write.mode("append").parquet(self.path("metrics"))
