"""Reaper role: periodic snapshot expiry + metadata/data GC
(Reaper.java:17-27 — expire older than 10 min, retain last 20)."""

from __future__ import annotations

import time

from ..table.table import Table

DEFAULT_MAX_AGE_MS = 10 * 60 * 1000  # Reaper.java:19
DEFAULT_RETAIN_LAST = 20  # Reaper.java:22


class Reaper:
    def __init__(
        self,
        table: Table,
        max_age_ms: int = DEFAULT_MAX_AGE_MS,
        retain_last: int = DEFAULT_RETAIN_LAST,
    ):
        self.table = table
        self.max_age_ms = max_age_ms
        self.retain_last = retain_last

    def run_once(self, now_ms: int | None = None) -> dict:
        now_ms = now_ms if now_ms is not None else int(time.time() * 1000)
        return self.table.expire_snapshots(
            older_than_ms=now_ms - self.max_age_ms, retain_last=self.retain_last
        )
