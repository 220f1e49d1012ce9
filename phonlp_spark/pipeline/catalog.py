"""Iceberg-shaped table catalog over Parquet (no Iceberg jars in the
sandbox — SURVEY.md intro).

Semantics kept from the Iceberg model:
- a table is a directory with immutable data files plus a snapshot log;
- every commit (append / overwrite) creates a new snapshot that lists
  EXACTLY the data files visible at that version (manifest);
- readers resolve a snapshot (latest by default) and read only its
  files -> time travel and atomic-ish visibility (the snapshot log is
  the commit point; half-written data dirs are invisible until logged);
- snapshot entries carry lineage metadata (operation, parent, row
  count, schema) — these double as audit/lineage records.

In production this layer is replaced 1:1 by real Iceberg tables; the
pipeline only uses commit()/read()/history().
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

_LOG = "_snapshots.json"


class CatalogTable:
    def __init__(self, path: str):
        self.path = path
        os.makedirs(path, exist_ok=True)

    # -- snapshot log ------------------------------------------------
    def _log_path(self) -> str:
        return os.path.join(self.path, _LOG)

    def history(self) -> list[dict]:
        try:
            with open(self._log_path()) as f:
                return json.load(f)
        except FileNotFoundError:
            return []

    def _append_snapshot(self, snap: dict) -> None:
        # serialize read-append-replace: without the lock, two
        # concurrent commits would both read the same history and the
        # later os.replace would drop the earlier snapshot.  The lock is
        # an OS advisory flock, NOT an O_EXCL sentinel file: flock dies
        # with the process, so a kill -9 between acquire and release
        # can't leave a stale lock that blocks every later commit.  The
        # lock file itself is never unlinked (unlink+recreate would let
        # two processes flock different inodes of the same path).
        import fcntl
        lock = self._log_path() + ".lock"
        fd = os.open(lock, os.O_CREAT | os.O_WRONLY, 0o644)
        deadline = time.time() + 30.0
        try:
            while True:
                try:
                    fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                    break
                except (BlockingIOError, InterruptedError):
                    if time.time() > deadline:
                        raise TimeoutError(
                            f"snapshot log lock held too long: {lock}"
                        ) from None
                    time.sleep(0.05)
            log = self.history()
            log.append(snap)
            tmp = self._log_path() + f".tmp-{uuid.uuid4().hex[:8]}"
            with open(tmp, "w") as f:
                json.dump(log, f, indent=1)
            os.replace(tmp, self._log_path())  # atomic commit point
        finally:
            os.close(fd)  # closing releases the flock

    def current(self) -> dict | None:
        log = self.history()
        return log[-1] if log else None

    # -- write -------------------------------------------------------
    def commit(self, df: DataFrame, operation: str = "append") -> dict:
        """Write df as a new immutable data dir and log a snapshot.

        operation: 'append' (new snapshot = parent files + new files)
        or 'overwrite' (new snapshot = new files only).
        """
        if operation not in ("append", "overwrite"):
            raise ValueError(f"unknown operation {operation!r}")
        snap_id = uuid.uuid4().hex[:16]
        data_dir = os.path.join(self.path, f"data-{snap_id}")
        # observed metrics ride the write job itself — no second scan
        from pyspark.sql import Observation
        from pyspark.sql import functions as F
        obs = Observation()
        df.observe(obs, F.count(F.lit(1)).alias("n")) \
            .write.mode("errorifexists").parquet(data_dir)
        n_rows = int(obs.get["n"])

        parent = self.current()
        dirs = [f"data-{snap_id}"]
        total = n_rows
        if operation == "append" and parent is not None:
            dirs = parent["data_dirs"] + dirs
            total += parent["total_rows"]
        snap = {
            "snapshot_id": snap_id,
            "parent_id": parent["snapshot_id"] if parent else None,
            "operation": operation,
            "timestamp_ms": int(time.time() * 1000),
            "data_dirs": dirs,
            "added_rows": n_rows,
            "total_rows": total,
            "schema": df.schema.simpleString(),
        }
        self._append_snapshot(snap)
        return snap

    # -- read --------------------------------------------------------
    def read(self, spark: SparkSession, snapshot_id: str | None = None) -> DataFrame:
        log = self.history()
        if not log:
            raise FileNotFoundError(f"no snapshots in {self.path}")
        if snapshot_id is None:
            snap = log[-1]
        else:
            matches = [s for s in log if s["snapshot_id"] == snapshot_id]
            if not matches:
                raise KeyError(f"snapshot {snapshot_id} not in {self.path}")
            snap = matches[0]
        paths = [os.path.join(self.path, d) for d in snap["data_dirs"]]
        return spark.read.parquet(*paths)
