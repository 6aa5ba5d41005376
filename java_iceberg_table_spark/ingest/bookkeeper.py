"""Bookkeeper role: the single committer that serializes metadata
commits while many writers stream files (FileBasedBookkeeper.java).

- R9  discovery: list _pending/tc_*.json with bounded retry
      (FileBasedBookkeeper.java:82-108).
- R10 parallel moniker read on a thread pool (:130-150, 8 threads).
- R12 one fast-append commit of everything pending, with per-batch
      latency accounting from moniker mtimes (:152-180).
- R11 moniker delete — AFTER the commit succeeds. The reference
      deletes before committing (:168-169); a crash in between loses
      the batch. We keep the handoff idempotent instead: the commit
      dedupes by file path against the current snapshot
      (append_entries(dedupe_paths=True)), so replaying a batch whose
      commit was durable but whose moniker deletion crashed
      re-appends nothing.
- R13 retention: floor(now - retention) to the partition width, then
      a metadata-only delete (:182-192).
"""

from __future__ import annotations

import glob
import json
import os
import time
from concurrent.futures import ThreadPoolExecutor

from ..table.table import Table

POOL_SIZE = 8  # FileBasedBookkeeper.java:28-29
LIST_RETRIES = 200  # :83-106


class Bookkeeper:
    def __init__(self, table: Table, batch_cap: int = 500):
        self.table = table
        self.batch_cap = batch_cap  # StorageQueueBasedBookkeeper.java:231
        self.pool = ThreadPoolExecutor(POOL_SIZE)
        self.total_files_appended = 0
        self.total_latency_ms = 0.0

    @property
    def pending_dir(self) -> str:
        return os.path.join(self.table.root, "_pending")

    def list_pending(self) -> list[str]:
        last_err = None
        for _ in range(LIST_RETRIES):
            try:
                os.makedirs(self.pending_dir, exist_ok=True)
                return sorted(glob.glob(os.path.join(self.pending_dir, "tc_*.json")))[
                    : self.batch_cap
                ]
            except OSError as e:  # pragma: no cover - FS flake path
                last_err = e
                time.sleep(0.01)
        raise last_err

    def _read_moniker(self, path: str) -> list[dict]:
        with open(path) as f:
            return json.load(f)["entries"]

    def run_once(self) -> dict:
        """One poll iteration: gather pending -> single append commit
        -> delete consumed monikers. Returns batch metrics."""
        paths = self.list_pending()
        if not paths:
            return {"files": 0, "monikers": 0, "avg_latency_ms": 0.0}
        now = time.time()
        latencies = [max(0.0, (now - os.path.getmtime(p)) * 1000) for p in paths]
        entry_lists = list(self.pool.map(self._read_moniker, paths))
        entries = [e for lst in entry_lists for e in lst]
        # dedupe_paths: crash-replay idempotence — a batch whose commit
        # landed but whose moniker deletion didn't is dropped here, not
        # double-appended. Returns None when the whole batch was a
        # replay; the monikers must still be deleted in that case.
        snap = self.table.append_entries(entries, dedupe_paths=True)
        # delete AFTER the durable commit (reference bug fixed)
        list(self.pool.map(os.remove, paths))
        # Count only files the commit actually appended: on crash-replay
        # dedupe_paths drops already-committed entries (snap is None when
        # the whole batch was a replay) and those must not inflate
        # throughput metrics.
        appended = int(snap.summary.get("added-files", 0)) if snap else 0
        self.total_files_appended += appended
        self.total_latency_ms += sum(latencies)
        return {
            "files": appended,
            "monikers": len(paths),
            "avg_latency_ms": sum(latencies) / len(latencies),
        }

    def apply_retention(self, retention_us: int, now_us: int | None = None) -> int:
        """R13: metadata-only delete of partitions older than the
        aligned cutoff; returns dropped-file count."""
        from ..table.transforms import CompositeTransform

        t = self.table.transform
        if isinstance(t, CompositeTransform):
            raise ValueError(
                "the ingestion bookkeeper's retention pass follows the "
                "reference's 1-D spec (Constants.java:33-35) — for a "
                "composite-partitioned table call Table.delete_where "
                "with an explicitly aligned cutoff on the temporal field"
            )
        now_us = now_us if now_us is not None else int(time.time() * 1_000_000)
        cutoff = t.apply_py(now_us - retention_us)  # FileBasedBookkeeper.java:184-186
        snap = self.table.delete_where(t.source_column, "<", cutoff)
        return snap.summary.get("deleted-files", 0) if snap else 0

    def run_loop(
        self, iterations: int, sleep_s: float = 0.0, retention_us: int | None = None
    ) -> dict:
        """Paced poll loop (Main.java:11-16,58-68)."""
        totals = {"files": 0, "batches": 0, "retention_dropped": 0}
        for _ in range(iterations):
            start = time.time()
            m = self.run_once()
            if m["files"]:
                totals["files"] += m["files"]
                totals["batches"] += 1
            if retention_us is not None:
                totals["retention_dropped"] += self.apply_retention(retention_us)
            elapsed = time.time() - start
            if sleep_s > elapsed:
                time.sleep(sleep_s - elapsed)
        return totals
