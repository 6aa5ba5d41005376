"""Writer role: generate event records, write parquet data files, hand
off pending-commit metadata ("monikers") to the bookkeeper.

Reference behavior re-expressed (Writer.java):
- R2  synthetic records: monotonic message_id, uuid data, now()
      timestamp, one shared timeperiod_loadedBy per batch, ~1750-byte
      binary payload (50 uuid-ish chunks, Writer.java:52-72) — but
      SEEDED so tests can assert exact row sets.
- R4  one parquet file per createDataFile call, partition-aware path
      (Writer.java:74-108); files written with pyarrow (driver-side
      metadata plane — these are many small files by design; the big
      data path is Table.append via Spark).
- R8  pending-commit handoff: JSON, write-temp-then-atomic-rename to
      tc_<uuid>.json (Writer.java:160-170).
- The direct-commit variant (writeandcommitfiles, Main.java:26-34)
  is write_and_commit() — the contended baseline the decoupled design
  exists to avoid.
"""

from __future__ import annotations

import json
import os
import random
import uuid as uuid_mod

import pyarrow as pa
import pyarrow.parquet as pq

from ..table.format import write_json_atomic
from ..table.stats import file_stats
from ..table.table import Table

EVENTS_SCHEMA = pa.schema(
    [
        pa.field("message_id", pa.int64(), nullable=False),
        pa.field("data", pa.string()),
        pa.field("timestamp", pa.timestamp("us", tz="UTC")),
        pa.field("timeperiod_loadedBy", pa.int64()),
        pa.field("message_body", pa.binary()),
    ]
)

PAYLOAD_BYTES = 1750  # Writer.java:57-63 (emulates Kafka avg 1432 B)


def make_records(
    n_rows: int, timeperiod_us: int, seed: int, start_id: int = 0
) -> pa.Table:
    """Deterministic analogue of createRecords (Writer.java:52-72)."""
    rng = random.Random(seed)
    ids = list(range(start_id, start_id + n_rows))
    datas = [uuid_mod.UUID(int=rng.getrandbits(128)).hex for _ in ids]
    ts = [timeperiod_us] * n_rows
    bodies = [rng.getrandbits(8 * PAYLOAD_BYTES).to_bytes(PAYLOAD_BYTES, "big") for _ in ids]
    return pa.Table.from_pydict(
        {
            "message_id": ids,
            "data": datas,
            "timestamp": ts,
            "timeperiod_loadedBy": [timeperiod_us] * n_rows,
            "message_body": bodies,
        },
        schema=EVENTS_SCHEMA,
    )


class Writer:
    def __init__(
        self,
        table: Table,
        writer_id: int = 0,
        seed: int = 42,
        file_format: str | None = None,
    ):
        self.table = table
        self.writer_id = writer_id
        self.seed = seed
        self._file_counter = 0
        # R5: the data-file format toggle (Constants.java:16,
        # Writer.java:92-96) — a table property, overridable per writer.
        self.file_format = (
            file_format
            or table.metadata.properties.get("write.format.default", "parquet")
        )
        if self.file_format not in ("parquet", "avro"):
            raise ValueError(f"unsupported data-file format {self.file_format!r}")

    def _write_file(self, records: "pa.Table", full: str) -> dict:
        """Write one data file in the toggled format; return its stats.
        Parquet stats come from the footer (R17); avro files carry
        write-time metrics computed from the in-memory batch — the same
        split as the reference (Writer.java:107 vs ParquetUtil)."""
        if self.file_format == "parquet":
            pq.write_table(records, full)
            return file_stats(full)
        from ..sources.avro_io import avro_schema_of, arrow_stats, write_ocf
        from pyspark.sql.types import StructType

        spark_schema = StructType.fromJson(self.table.metadata.schema_json)
        # stats come from the PRE-cast batch so timestamp min/max record
        # ISO strings exactly like the parquet footer path (_plain):
        # pruning on a table whose history spans the format toggle must
        # compare like-typed bounds
        original = records
        # timestamps travel as integer µs in avro (timestamp-micros)
        cast_cols = {}
        for name in records.column_names:
            col = records.column(name)
            if pa.types.is_timestamp(col.type):
                cast_cols[name] = col.cast(pa.int64())
        if cast_cols:
            for name, col in cast_cols.items():
                records = records.set_column(
                    records.column_names.index(name), name, col
                )
        rows = records.to_pylist()
        write_ocf(full, rows, avro_schema_of(spark_schema))
        return arrow_stats(original, os.path.getsize(full))

    def create_data_files(
        self, n_files: int, rows_per_file: int, timeperiod_us: int
    ) -> list[dict]:
        """R6: write n_files data files (parquet or avro per the R5
        toggle) for one shared timeperiod stamp (Writer.java:126-137);
        returns manifest entries."""
        md = self.table.metadata
        t = self.table.transform
        from ..table.transforms import CompositeTransform

        if isinstance(t, CompositeTransform):
            raise ValueError(
                "the synthetic-record writer mirrors the reference's "
                "single-field timeperiod spec (Writer.java:126-137); "
                "composite-partitioned tables ingest via Table.append "
                "or the connector"
            )
        spec_id = self.table.current_spec_id(md)
        entries = []
        for _ in range(n_files):
            bucket = t.apply_py(timeperiod_us) if t else None
            sub = f"__pb={bucket}" if t else "unpartitioned"
            ext = "parquet" if self.file_format == "parquet" else "avro"
            fname = f"w{self.writer_id}-{self._file_counter}-{uuid_mod.uuid4().hex}.{ext}"
            rel = os.path.join("data", sub, fname)
            full = os.path.join(self.table.root, rel)
            os.makedirs(os.path.dirname(full), exist_ok=True)
            records = make_records(
                rows_per_file,
                timeperiod_us,
                seed=self.seed * 100003 + self.writer_id * 1009 + self._file_counter,
                start_id=self._file_counter * rows_per_file,
            )
            st = self._write_file(records, full)
            entries.append(
                {
                    "path": rel,
                    "rows": st["rows"],
                    "bytes": st["bytes"],
                    "partition": bucket,
                    "columns": st["columns"],
                    # spec stamp (evolution-aware pruning; 0 implicit)
                    **({"spec_id": spec_id} if spec_id else {}),
                }
            )
            self._file_counter += 1
        return entries

    def write_pending_commit(self, entries: list[dict]) -> str:
        """R8: publish the moniker atomically — visible to the
        bookkeeper only after the rename (Writer.java:160-170)."""
        pending_dir = os.path.join(self.table.root, "_pending")
        os.makedirs(pending_dir, exist_ok=True)
        final = os.path.join(pending_dir, f"tc_{uuid_mod.uuid4().hex}.json")
        write_json_atomic(final, {"entries": entries})
        return final

    def run_iteration(
        self, n_files: int, rows_per_file: int, timeperiod_us: int
    ) -> str:
        entries = self.create_data_files(n_files, rows_per_file, timeperiod_us)
        return self.write_pending_commit(entries)

    def write_and_commit(
        self, n_files: int, rows_per_file: int, timeperiod_us: int
    ):
        """The contended direct-commit baseline (Main.java:26-34) —
        every writer commits itself, racing on the version CAS."""
        entries = self.create_data_files(n_files, rows_per_file, timeperiod_us)
        return self.table.append_entries(entries)
