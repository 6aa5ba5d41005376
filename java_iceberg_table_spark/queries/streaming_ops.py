"""Group I — streaming surface as oracle-checked queries.

Each query stages the events fixture as arriving files, runs a real
Structured Streaming job to completion (availableNow trigger), and
returns the final state as a batch DataFrame — which must equal the
batch/SQL formulation in DuckDB. Streaming-only semantics that can't
be oracled this way (watermark drops, streaming dedup, restart
exactly-once) are covered in tests/test_streaming.py.
"""

from __future__ import annotations

import os
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


@register(
    "i4_sliding_window_stream",
    oracle="""
WITH e AS (SELECT ts::TIMESTAMP AS ts FROM events),
buckets AS (
  SELECT (epoch_us(ts) - epoch_us(ts) % 300000000) AS s FROM e
  UNION ALL
  SELECT (epoch_us(ts) - epoch_us(ts) % 300000000) - 300000000 AS s FROM e
)
SELECT s AS window_start_us, COUNT(*) AS cnt
FROM buckets GROUP BY s ORDER BY s
""",
    group="I",
)
def i4_sliding_window_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sliding window (10 min / 5 min): each event lands in
    exactly two windows — the batch-SQL oracle materializes both."""
    from ..streaming.jobs import sliding_counts

    src, _ = stage_events_files(spark, sf_dir, n_files=4)
    try:
        agg = sliding_counts(file_stream(spark, src, 2), "ts", "10 minutes", "5 minutes")
        return run_to_memory(agg, output_mode="complete").orderBy("window_start_us")
    finally:
        shutil.rmtree(src, ignore_errors=True)


@register(
    "i5_session_window_stream",
    oracle="""
WITH e AS (SELECT user_id, ts::TIMESTAMP AS ts FROM events),
x AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS ns
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
s AS (SELECT user_id, ts,
             SUM(ns) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
      FROM x)
SELECT user_id,
       epoch_us(MIN(ts)) AS session_start_us,
       epoch_us(MAX(ts) + INTERVAL 30 MINUTE) AS session_end_us,
       COUNT(*) AS cnt
FROM s GROUP BY user_id, sid
ORDER BY user_id, session_start_us
""",
    group="I",
)
def i5_session_window_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming session window (30-min gap) == batch lag-gap
    sessionization (E3 pattern) expressed in the SQL oracle. Session
    end = last event + gap, [start, end) — a gap of exactly 30 min
    starts a new session in both formulations."""
    from ..streaming.jobs import session_counts

    src, _ = stage_events_files(spark, sf_dir, n_files=4)
    try:
        agg = session_counts(file_stream(spark, src, 2), "user_id", "ts", "30 minutes")
        return run_to_memory(agg, output_mode="complete").orderBy(
            "user_id", "session_start_us"
        )
    finally:
        shutil.rmtree(src, ignore_errors=True)


@register(
    "i9_stateful_sessionization",
    oracle="""
WITH d AS (
  SELECT user_id, epoch_us(ts) AS t,
         CASE WHEN LAG(epoch_us(ts)) OVER w IS NULL
              OR epoch_us(ts) - LAG(epoch_us(ts)) OVER w > 1800000000
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
s AS (SELECT user_id, t,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY t
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM d)
SELECT user_id, MIN(t) AS start_us, MAX(t) AS end_us, COUNT(*) AS n_events
FROM s GROUP BY user_id, sid
ORDER BY user_id, start_us
""",
    group="I",
)
def i9_stateful_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator (applyInPandasWithState): per-user
    30-minute-gap sessions with exact event counts, built from
    order-invariant mergeable interval state + a flush sentinel. The
    oracle is the batch islands formulation (LAG + running break-sum);
    the streaming run over arbitrary micro-batch splits must produce
    the identical session set."""
    from ..streaming.jobs import stage_events_with_flush, stateful_sessions

    src = stage_events_with_flush(spark, sf_dir, n_files=4)
    try:
        stream = file_stream(spark, src, max_files_per_trigger=2)
        sess = stateful_sessions(stream, gap_minutes=30)
        return run_to_memory(sess, output_mode="append").orderBy("user_id", "start_us")
    finally:
        shutil.rmtree(os.path.dirname(src), ignore_errors=True)
