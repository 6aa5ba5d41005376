"""Streaming building blocks.

The reference's whole architecture is a micro-batched file-ingestion
stream (poll loops over a moniker directory / storage queue —
Main.java:11-16, FileBasedBookkeeper.java:152-180,
StorageQueueBasedBookkeeper.java:214-291). Structured Streaming's file
source + foreachBatch is the idiomatic Spark form:

- file source with ``maxFilesPerTrigger`` == the 500-moniker batch cap
- ``foreachBatch(append_to_table)`` == the bookkeeper's one-commit-
  per-batch, with a batch-id high-watermark for exactly-once across
  restarts (the moniker-uuid idempotence analogue of Writer.java:160-170)
- watermarks + windows express the event-time semantics the reference
  delegates to its 5-minute partition transform.
"""

from __future__ import annotations

import os
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fixtures import load_table
from ..table.table import Table


def stage_events_files(
    spark: SparkSession, sf_dir: str, n_files: int = 4
) -> tuple[str, DataFrame]:
    """Write the (µs-normalized) events fixture as n parquet files in a
    temp dir — the 'arriving files' feed for file-source streams.
    Returns (dir, batch_df_for_equivalence_checks)."""
    out = tempfile.mkdtemp(prefix="stream_src_")
    ev = load_table(spark, sf_dir, "events")
    ev.repartition(n_files).write.mode("overwrite").parquet(os.path.join(out, "events"))
    src = os.path.join(out, "events")
    return src, spark.read.parquet(src)


def file_stream(
    spark: SparkSession, src_dir: str, max_files_per_trigger: int = 2
) -> DataFrame:
    """I1: micro-batch file ingestion (R15's cap semantics)."""
    schema = spark.read.parquet(src_dir).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(src_dir)
    )


def run_to_memory(
    stream_df: DataFrame, output_mode: str = "append", name: str | None = None
) -> DataFrame:
    """Run a streaming DataFrame to completion (availableNow) into a
    memory sink; return the final result as a batch DataFrame."""
    name = name or f"mem_{uuid.uuid4().hex[:12]}"
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark = stream_df.sparkSession
    return spark.table(name)


def foreach_batch_append(table: Table):
    """I2: exactly-once foreachBatch committer. The batch id is
    recorded in the snapshot summary; on restart-replay a batch whose
    id is <= the high watermark is skipped, so commits are idempotent
    even though foreachBatch is at-least-once."""

    def commit(batch_df: DataFrame, batch_id: int) -> None:
        last = -1
        md = table.metadata
        for s in md.snapshots:
            bid = s.summary.get("streaming-batch-id")
            if bid is not None:
                last = max(last, int(bid))
        if batch_id <= last:
            return  # replayed batch — already durably committed
        if batch_df.isEmpty():
            return
        snap = table.append(batch_df)
        # stamp the batch id for the watermark (post-commit metadata op)
        def build(current):
            for s in current.snapshots:
                if s.snapshot_id == snap.snapshot_id:
                    s.summary["streaming-batch-id"] = int(batch_id)
            from ..table.format import TableMetadata

            return TableMetadata(
                version=current.version + 1,
                table_uuid=current.table_uuid,
                schema_json=current.schema_json,
                partition_spec=current.partition_spec,
                properties=current.properties,
                snapshots=current.snapshots,
                current_snapshot_id=current.current_snapshot_id,
            )

        from ..table import format as fmt

        fmt.commit(table.root, build)

    return commit


def stream_append_to_table(
    spark: SparkSession, src_dir: str, table: Table, max_files_per_trigger: int = 2
) -> None:
    """Run the full decoupled-ingestion stream: file source ->
    foreachBatch -> engine-table snapshots (the Spark-idiomatic
    bookkeeper, R12/R15)."""
    ckpt = tempfile.mkdtemp(prefix="ckpt_")
    q = (
        file_stream(spark, src_dir, max_files_per_trigger)
        .writeStream.foreachBatch(foreach_batch_append(table))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def tumbling_counts(stream_df: DataFrame, ts_col: str = "ts", width: str = "5 minutes") -> DataFrame:
    """I3: tumbling event-time window — the streaming form of the
    reference's 5-minute partition bucketing (Constants.java:25)."""
    return (
        stream_df.groupBy(F.window(ts_col, width).alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.unix_micros(F.col("w.start")).alias("window_start_us"), "cnt")
    )


def sliding_counts(
    stream_df: DataFrame, ts_col: str = "ts", width: str = "10 minutes", slide: str = "5 minutes"
) -> DataFrame:
    """I4: sliding window (each event lands in width/slide windows)."""
    return (
        stream_df.groupBy(F.window(ts_col, width, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.unix_micros(F.col("w.start")).alias("window_start_us"), "cnt")
    )


def session_counts(
    stream_df: DataFrame, key_col: str = "user_id", ts_col: str = "ts", gap: str = "30 minutes"
) -> DataFrame:
    """I5: session window (gap-based)."""
    return (
        stream_df.groupBy(F.col(key_col), F.session_window(F.col(ts_col), gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            key_col,
            F.unix_micros(F.col("w.start")).alias("session_start_us"),
            F.unix_micros(F.col("w.end")).alias("session_end_us"),
            "cnt",
        )
    )
