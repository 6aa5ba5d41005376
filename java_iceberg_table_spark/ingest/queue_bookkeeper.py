"""Queue-driven bookkeeper (v2): commit files announced by storage
events instead of directory listing (StorageQueueBasedBookkeeper.java).

Pipeline, re-expressed Spark-first:

1. **Message feed**: a DataFrame of raw queue messages — base64-encoded
   Event Grid ``BlobCreated`` JSON (the Azure Storage Queue shape,
   :68-99). Batch or readStream; the source is pluggable.
2. **Parse/filter** (:178-212): pure DataFrame pipeline — ``unbase64``
   -> ``from_json`` -> keep BlobCreated + FlushWithClose + '/data/' +
   .parquet, regexp-rebuild the blob URL to a storage path (:45,
   197-204). All JVM-side expressions (queries G9-G11 exercise the
   same primitives under the DuckDB oracle).
3. **Footer-stats recovery** (:63-66, 127-157): the bookkeeper didn't
   write these files, so column metrics are rebuilt from parquet
   footers on an 8-thread pool (metadata-plane IO, O(row groups)).
   The reference reads Avro files with the Parquet reader (:142-144 —
   a bug); we accept .parquet only and surface the rest.
4. **Commit** (:257-266): one fast-append snapshot per batch, capped at
   500 files (:231); message "deletion" (consumption) happens after
   the durable commit.
"""

from __future__ import annotations

import base64
import json
import os
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from ..table.stats import file_stats
from ..table.table import Table
from ..table.transforms import TruncateTransform

POOL_SIZE = 8  # StorageQueueBasedBookkeeper.java:41-42
BATCH_CAP = 500  # :231

EVENT_SCHEMA = StructType(
    [
        StructField("eventType", StringType()),
        StructField(
            "data",
            StructType(
                [
                    StructField("api", StringType()),
                    StructField("url", StringType()),
                    StructField("contentLength", StringType()),
                ]
            ),
        ),
    ]
)

# https://<account-host>/<container>/<path> (the reference's regex, :45)
_URL_PATTERN = r"https://([^/]+)/([^/]+)/(.*)"


def make_blob_created_message(url: str, api: str = "FlushWithClose", size: int = 0) -> str:
    """Synthetic Event Grid message (base64 JSON) for feeds/tests —
    mirrors the queue payload the reference consumes."""
    payload = {
        "eventType": "Microsoft.Storage.BlobCreated",
        "data": {"api": api, "url": url, "contentLength": str(size)},
    }
    return base64.b64encode(json.dumps(payload).encode()).decode()


def parse_messages(raw: DataFrame, msg_col: str = "message") -> DataFrame:
    """R16 as a declarative pipeline: returns (blob_path,) monikers.

    The https URL is rewritten to ``<container>@<host>/<path>`` form —
    for local tables the third regex group IS the table-relative path,
    which downstream joins against the table root."""
    decoded = raw.select(
        F.from_json(F.unbase64(F.col(msg_col)).cast("string"), EVENT_SCHEMA).alias("e")
    )
    return (
        decoded.filter(F.col("e.eventType") == "Microsoft.Storage.BlobCreated")
        .filter(F.col("e.data.api") == "FlushWithClose")
        .filter(F.col("e.data.url").contains("/data/"))
        .filter(F.col("e.data.url").endswith(".parquet"))
        .select(
            F.regexp_extract("e.data.url", _URL_PATTERN, 3).alias("blob_path"),
            F.concat(
                F.lit("abfss://"),
                F.regexp_extract("e.data.url", _URL_PATTERN, 2),
                F.lit("@"),
                F.regexp_extract("e.data.url", _URL_PATTERN, 1),
                F.lit("/"),
                F.regexp_extract("e.data.url", _URL_PATTERN, 3),
            ).alias("abfss_url"),
        )
    )


class QueueBookkeeper:
    def __init__(self, table: Table, batch_cap: int = BATCH_CAP):
        self.table = table
        self.batch_cap = batch_cap
        self.pool = ThreadPoolExecutor(POOL_SIZE)
        self.total_files = 0

    def _resolve_entry(self, rel_path: str) -> dict:
        """MetricResolver.call (:127-157): footer stats -> manifest
        entry; partition value recovered from the bucket directory."""
        full = os.path.join(self.table.root, rel_path)
        st = file_stats(full)
        partition = None
        t: TruncateTransform | None = self.table.transform
        from ..table.transforms import CompositeTransform

        if isinstance(t, CompositeTransform):
            raise ValueError(
                "queue-driven ingestion mirrors the reference's 1-D "
                "spec; composite-partitioned tables ingest via "
                "Table.append or the connector"
            )
        if t is not None:
            for part in rel_path.split(os.sep):
                if part.startswith("__pb="):
                    partition = int(part.split("=", 1)[1])
            if partition is None:
                # fall back to the column's footer min (whole-file
                # bucket membership is the writer's contract)
                cmin = st["columns"].get(t.source_column, {}).get("min")
                if cmin is not None:
                    partition = t.apply_py(int(cmin))
        spec_id = self.table.current_spec_id()
        return {
            "path": rel_path,
            "rows": st["rows"],
            "bytes": st["bytes"],
            "partition": partition,
            "columns": st["columns"],
            # spec stamp (evolution-aware pruning; 0 implicit)
            **({"spec_id": spec_id} if spec_id else {}),
        }

    def process_messages(self, raw_messages: DataFrame) -> dict:
        """One queue drain: parse -> resolve (thread pool) -> single
        fast-append commit, capped at batch_cap files (:214-291)."""
        monikers = [r["blob_path"] for r in parse_messages(raw_messages).collect()]
        monikers = monikers[: self.batch_cap]
        if not monikers:
            return {"files": 0}
        entries = list(self.pool.map(self._resolve_entry, monikers))
        # dedupe_paths: a queue message redelivered after a durable
        # commit (at-least-once queues redeliver on missed ack) must
        # not double-append its file
        snap = self.table.append_entries(entries, dedupe_paths=True)
        # count only files actually committed: a redelivered batch whose
        # entries all deduped (snap None) contributes zero, not len(entries)
        appended = int(snap.summary.get("added-files", 0)) if snap else 0
        self.total_files += appended
        return {"files": appended, "rows": int(snap.summary.get("added-rows", 0)) if snap else 0}
