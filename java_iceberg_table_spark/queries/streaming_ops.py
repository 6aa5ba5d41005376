"""Group I — streaming surface as oracle-checked queries.

Each query stages the events fixture as arriving files, runs a real
Structured Streaming job to completion (availableNow trigger), and
returns the final state as a batch DataFrame — which must equal the
batch/SQL formulation in DuckDB. Streaming-only semantics that can't
be oracled this way (watermark drops, streaming dedup, restart
exactly-once) are covered in tests/test_streaming.py.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming.jobs import (
    file_stream,
    run_to_memory,
    stage_events_files,
    stream_append_to_table,
    tumbling_counts,
)
from . import register


@register(
    "i1_file_stream_ingest",
    oracle="SELECT COUNT(*) AS cnt, COUNT(DISTINCT event_id) AS dcnt FROM events",
    group="I",
)
def i1_file_stream_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Micro-batch file ingestion (maxFilesPerTrigger cap): the stream
    must deliver every staged row exactly once."""
    src, _ = stage_events_files(spark, sf_dir, n_files=4)
    try:
        result = run_to_memory(file_stream(spark, src, max_files_per_trigger=2))
        row = result.agg(
            F.count(F.lit(1)).alias("cnt"), F.countDistinct("event_id").alias("dcnt")
        ).collect()[0]
        return spark.createDataFrame([(row["cnt"], row["dcnt"])], "cnt bigint, dcnt bigint")
    finally:
        shutil.rmtree(src, ignore_errors=True)


@register(
    "i2_stream_commit_to_engine_table",
    oracle="SELECT COUNT(*) AS cnt, SUM(event_id)::BIGINT AS sum_id FROM events",
    group="I",
)
def i2_stream_commit_to_engine_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """foreachBatch -> engine-table snapshot commits (the Spark-
    idiomatic bookkeeper): the final table content equals the source."""
    from ..table import create_table

    src, batch_df = stage_events_files(spark, sf_dir, n_files=4)
    root = tempfile.mkdtemp(prefix="stream_tbl_") + "/t"
    try:
        tbl = create_table(root, batch_df.schema)
        stream_append_to_table(spark, src, tbl, max_files_per_trigger=2)
        row = (
            tbl.scan(spark)
            .agg(F.count(F.lit(1)).alias("cnt"), F.sum("event_id").alias("sum_id"))
            .collect()[0]
        )
        return spark.createDataFrame([(row["cnt"], row["sum_id"])], "cnt bigint, sum_id bigint")
    finally:
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(root, ignore_errors=True)


@register(
    "i3_tumbling_window_stream",
    oracle="""
SELECT (epoch_us(ts) - epoch_us(ts) % 300000000) AS window_start_us,
       COUNT(*) AS cnt
FROM events GROUP BY 1 ORDER BY 1
""",
    group="I",
)
def i3_tumbling_window_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming tumbling 5-minute window == batch epoch bucketing
    (G5 semantics — the reference's partition width)."""
    src, _ = stage_events_files(spark, sf_dir, n_files=4)
    try:
        agg = tumbling_counts(file_stream(spark, src, 2), "ts", "5 minutes")
        result = run_to_memory(agg, output_mode="complete")
        return result.orderBy("window_start_us")
    finally:
        shutil.rmtree(src, ignore_errors=True)
