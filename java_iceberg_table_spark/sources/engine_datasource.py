"""The engine table as a first-class Spark data source (Python Data
Source API, Spark 4): ``spark.read.format("engine_table")``,
``df.write.format("engine_table")``, ``spark.readStream`` /
``writeStream`` all work against a table root.

This is the connector story the reference leaves to Iceberg's Spark
runtime (its tables are only reachable through Iceberg APIs,
Writer.java:84-96); here the engine speaks Spark's own source/sink
protocol, so the table composes with everything else in a Spark job —
joins against parquet, streaming into memory sinks, SQL over
``spark.read`` — with no engine-specific reader code at the call site.

Scale design:
- **Planning is metadata-only, execution is per-file.** The driver
  plans one input partition per live data file (manifest pruning with
  pushed-down filters first); executors read their file via pyarrow
  and hand Spark Arrow record batches — no row-at-a-time Python, no
  driver collect.
- **Distributed writes, single atomic commit.** Each write task
  streams its Arrow batches straight into ``data/`` (a file on disk
  means nothing until committed — crash-safe with zero coordination,
  the writer/bookkeeper decoupling of the reference) and sends footer
  stats back as its commit message; the driver commits ONE fast-append
  snapshot from all messages. Aborts delete the orphans eagerly
  (expiry GC would also sweep them).
- **Streaming reads tail the commit log.** Offsets are snapshot ids;
  ``partitions(start, end]`` are exactly the files appended by the
  commits between them — the change feed, replayable as long as the
  snapshots are retained (standard retention caveat: a checkpoint
  older than snapshot expiry cannot resume).
- **Streaming writes are exactly-once.** The epoch commit stamps
  Spark's batch id into the snapshot summary; a replayed epoch is
  detected by the batch-id high-watermark and skipped.
"""

from __future__ import annotations

import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceArrowWriter,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamArrowWriter,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType


@dataclass
class FilePartition(InputPartition):
    path: str  # absolute


@dataclass
class FilesCommit(WriterCommitMessage):
    entries: list  # manifest entries (paths relative to table root)


_FILTER_OPS = {
    EqualTo: "=",
    GreaterThan: ">",
    GreaterThanOrEqual: ">=",
    LessThan: "<",
    LessThanOrEqual: "<=",
}


def _arrow_schema_for(schema: StructType):
    from pyspark.sql.pandas.types import to_arrow_schema

    return to_arrow_schema(schema)


def _read_file_batches(path: str, schema: StructType):
    """Executor-side: one data file -> Arrow batches aligned to the
    table schema (schema evolution: missing columns null-filled,
    dropped columns pruned, physical order normalized)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    target = _arrow_schema_for(schema)
    tbl = pq.read_table(path, columns=None)
    cols = []
    for fld in target:
        if fld.name in tbl.column_names:
            cols.append(tbl.column(fld.name).cast(fld.type))
        else:
            cols.append(pa.nulls(len(tbl), fld.type))
    yield from pa.Table.from_arrays(cols, schema=target).to_batches()


def _write_task_files(batch_iter, root: str, schema: StructType, spec: dict | None):
    """Executor-side: stream this task's Arrow batches into data/ —
    one file per partition bucket per task when the table is
    partitioned — and return manifest entries with footer stats."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ..table.stats import file_stats
    from ..table.transforms import TruncateTransform

    target = _arrow_schema_for(schema)
    t = TruncateTransform.from_json(spec) if spec else None
    task_id = uuid.uuid4().hex
    out_dir = os.path.join(root, "data", f"ds-{task_id[:8]}")
    os.makedirs(out_dir, exist_ok=True)
    writers: dict[object, pq.ParquetWriter] = {}
    paths: dict[object, str] = {}

    def sink_for(bucket):
        if bucket not in writers:
            suffix = "" if bucket is None else f"-p{bucket}"
            paths[bucket] = os.path.join(out_dir, f"f-{task_id}{suffix}.parquet")
            writers[bucket] = pq.ParquetWriter(paths[bucket], target)
        return writers[bucket]

    try:
        for batch in batch_iter:
            at = pa.Table.from_batches([batch]).cast(target)
            if t is None:
                sink_for(None).write_table(at)
                continue
            col = at.column(t.source_column)
            w = pa.scalar(t.width, type=col.type)
            # floor-mod bucketing v - ((v mod W) + W) mod W in EXACT
            # integer arithmetic (Arrow integer divide truncates toward
            # zero; fix up negative remainders). A float64 detour would
            # lose precision past 2^53 — e.g. nanosecond timestamps —
            # and mislabel buckets, making plan_files silently prune
            # files that do contain matching rows. Mirrors
            # TruncateTransform.apply_py exactly.
            r = pc.subtract(col, pc.multiply(pc.divide(col, w), w))
            m = pc.if_else(pc.less(r, pa.scalar(0, col.type)), pc.add(r, w), r)
            bucket_arr = pc.subtract(col, m)
            at = at.append_column("__b", bucket_arr)
            for bucket in pc.unique(bucket_arr).to_pylist():
                part = at.filter(pc.equal(at.column("__b"), bucket)).drop(["__b"])
                sink_for(bucket).write_table(part)
    finally:
        for w in writers.values():
            w.close()
    entries = []
    for bucket, p in paths.items():
        st = file_stats(p)
        if st["rows"] == 0:
            os.remove(p)
            continue
        entries.append(
            {
                "path": os.path.relpath(p, root),
                "rows": st["rows"],
                "bytes": st["bytes"],
                "partition": None if bucket is None else int(bucket),
                "columns": st["columns"],
            }
        )
    return entries


class EngineBatchReader(DataSourceReader):
    def __init__(self, root: str, schema: StructType, options):
        self.root = root
        self.schema = schema
        self.snapshot_id = (
            int(options["snapshot_id"]) if "snapshot_id" in options else None
        )
        self.ref = options.get("ref")
        self.engine_filters: list[tuple[str, str, object]] = []

    def pushFilters(self, filters):
        """Use every stats-expressible filter for manifest pruning but
        report ALL filters unsupported: Spark re-applies them after the
        scan, so pruning is a pure win and residual evaluation stays in
        the JVM (the engine's own scan() makes the same split)."""
        for f in filters:
            op = _FILTER_OPS.get(type(f))
            if op is not None and len(f.attribute) == 1:
                self.engine_filters.append((f.attribute[0], op, f.value))
            yield f

    def partitions(self):
        from ..table import load_table

        tbl = load_table(self.root)
        sid = self.snapshot_id
        if self.ref is not None:
            sid = tbl.metadata.refs[self.ref]["snapshot_id"]
        entries = tbl.plan_files(self.engine_filters, snapshot_id=sid)
        return [FilePartition(os.path.join(self.root, e["path"])) for e in entries]

    def read(self, partition: FilePartition):
        yield from _read_file_batches(partition.path, self.schema)


class EngineStreamReader(DataSourceStreamReader):
    """Commit-log tail: offset = snapshot id (log position, not data
    position — ids are random but the log is append-ordered)."""

    def __init__(self, root: str, schema: StructType):
        self.root = root
        self.schema = schema

    def _table(self):
        from ..table import load_table

        return load_table(self.root)

    def initialOffset(self) -> dict:
        return {"snapshot_id": None}

    def latestOffset(self) -> dict:
        snap = self._table().metadata.current_snapshot()
        return {"snapshot_id": None if snap is None else snap.snapshot_id}

    def partitions(self, start: dict, end: dict):
        a, b = start.get("snapshot_id"), end.get("snapshot_id")
        if b is None or a == b:
            return []
        tbl = self._table()
        entries: list[dict] = []
        seen = a is None
        found_end = False
        for s in tbl.metadata.snapshots:  # append-ordered log
            if not seen:
                seen = s.snapshot_id == a
                continue
            if s.operation == "append":
                entries.extend(tbl.added_files(s))
            if s.snapshot_id == b:
                found_end = True
                break
        if not seen or not found_end:
            raise ValueError(
                f"offset range ({a}, {b}] not in the retained snapshot log "
                "(checkpoint older than snapshot expiry?)"
            )
        return [FilePartition(os.path.join(self.root, e["path"])) for e in entries]

    def read(self, partition: FilePartition):
        yield from _read_file_batches(partition.path, self.schema)

    def commit(self, end: dict) -> None:
        pass  # retention is the table's expiry policy, not the stream's

    def stop(self) -> None:
        pass


class _WriterBase:
    def __init__(self, root: str, schema: StructType):
        from ..table import load_table

        self.root = root
        self.schema = schema
        # capture the partition spec driver-side; executors get plain data
        self.spec = load_table(root).metadata.partition_spec

    def write(self, iterator):
        return FilesCommit(_write_task_files(iterator, self.root, self.schema, self.spec))

    def _all_entries(self, messages):
        return [e for m in messages if m is not None for e in m.entries]

    def _delete_files(self, messages):
        for e in self._all_entries(messages):
            try:
                os.remove(os.path.join(self.root, e["path"]))
            except FileNotFoundError:
                pass


class EngineBatchWriter(_WriterBase, DataSourceArrowWriter):
    def commit(self, messages) -> None:
        from ..table import load_table

        entries = self._all_entries(messages)
        if entries:
            load_table(self.root).append_entries(entries)

    def abort(self, messages) -> None:
        self._delete_files(messages)


class EngineStreamWriter(_WriterBase, DataSourceStreamArrowWriter):
    def commit(self, messages, batchId: int) -> None:
        from ..table import load_table

        entries = self._all_entries(messages)
        tbl = load_table(self.root)
        last = -1
        for s in tbl.metadata.snapshots:
            bid = s.summary.get("streaming-batch-id")
            if bid is not None:
                last = max(last, int(bid))
        if batchId <= last:  # replayed epoch — already durably committed
            self._delete_files(messages)
            return
        if not entries:
            return
        # batch id rides in the SAME commit as the data (extra_summary):
        # stamping it in a second metadata edit would leave a crash
        # window where the data is durable but unstamped, and the
        # replayed epoch above would double-append.
        tbl.append_entries(entries, extra_summary={"streaming-batch-id": int(batchId)})

    def abort(self, messages, batchId: int) -> None:
        self._delete_files(messages)


class EngineTableDataSource(DataSource):
    """format("engine_table").option("root", <table root>); readers
    also accept option("snapshot_id") / option("ref") for time travel."""

    @classmethod
    def name(cls) -> str:
        return "engine_table"

    def _root(self) -> str:
        root = self.options.get("root")
        if not root:
            raise ValueError('engine_table requires .option("root", <table root>)')
        return root

    def schema(self) -> StructType:
        from ..table import load_table

        return load_table(self._root()).schema()

    def reader(self, schema: StructType) -> DataSourceReader:
        return EngineBatchReader(self._root(), schema, self.options)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return EngineStreamReader(self._root(), schema)

    def writer(self, schema: StructType, overwrite: bool):
        if overwrite:
            raise ValueError(
                "engine_table sink is append-only (mode='append'); use "
                "Table.upsert/delete_rows for row-level changes"
            )
        return EngineBatchWriter(self._root(), schema)

    def streamWriter(self, schema: StructType, overwrite: bool):
        return EngineStreamWriter(self._root(), schema)


def register_engine_datasource(spark) -> None:
    # EngineBatchReader implements pushFilters(); Spark 4 rejects such
    # readers outright (not merely skipping pushdown) unless this conf
    # is on. It is runtime-settable, so registration turns it on.
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(EngineTableDataSource)
