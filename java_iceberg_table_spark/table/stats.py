"""Per-file column statistics from Parquet footers.

The reference captures DataFile metrics at write time (Writer.java:107)
and recovers them from footers when it didn't write the file itself
(StorageQueueBasedBookkeeper.java:63-66, ParquetUtil.fileMetrics). This
module is the footer path: pyarrow reads only footer metadata — no data
pages — so stats collection is O(row groups), not O(rows).
"""

from __future__ import annotations

import datetime as _dt
from typing import Any

import pyarrow.parquet as pq


def _plain(v: Any) -> Any:
    """JSON-safe representation of a footer min/max value. Temporal
    bounds render as NAIVE-UTC isoformat: pyarrow hands back tz-aware
    datetimes for UTC-adjusted int64 timestamps, and a '+00:00' suffix
    would break boundary equality against predicate/key renderings
    (naive '…T11:15:00' sorts BEFORE '…T11:15:00+00:00', so a key equal
    to a file's min would prune the file that holds it)."""
    if isinstance(v, bytes):
        try:
            return v.decode("utf-8")
        except UnicodeDecodeError:
            return v.hex()
    if isinstance(v, _dt.datetime):
        if v.tzinfo is not None:
            v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    return v


def file_stats(path: str) -> dict:
    """{rows, bytes, columns: {name: {min, max, nulls}}} for one file."""
    pf = pq.ParquetFile(path)
    md = pf.metadata
    cols: dict[str, dict] = {}
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            name = col.path_in_schema
            st = col.statistics
            if st is None:
                continue
            entry = cols.setdefault(name, {"min": None, "max": None, "nulls": 0})
            if st.has_min_max:
                mn, mx = _plain(st.min), _plain(st.max)
                # NaN poisons every bound comparison (NaN < x and
                # NaN > x are both False, so a NaN max silently prunes
                # files that DO match — Spark/DuckDB order NaN above
                # all values). A row group containing NaN gets no
                # usable bound: drop the column's stats entirely for
                # this file (absent stats = never pruned).
                if mn != mn or mx != mx:
                    entry["min"] = entry["max"] = None
                    entry["poisoned"] = True
                elif not entry.get("poisoned"):
                    if entry["min"] is None or mn < entry["min"]:
                        entry["min"] = mn
                    if entry["max"] is None or mx > entry["max"]:
                        entry["max"] = mx
            entry["nulls"] += st.null_count or 0
    import os

    for entry in cols.values():
        entry.pop("poisoned", None)  # build-time marker, not manifest data
    return {
        "rows": md.num_rows,
        "bytes": os.path.getsize(path),
        "columns": cols,
    }
