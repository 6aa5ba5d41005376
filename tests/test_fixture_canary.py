"""Fixture-shape canaries.

Round 3 shipped on a silent fixture regeneration: events.ts changed
from TIMESTAMP(NANOS)-as-long to parquet timestamp[us] (no UTC flag),
which Spark 4 reads as TIMESTAMP_NTZ — breaking every watermark /
unix_micros consumer while old CORRECTNESS rows still showed green.
These tests pin the post-normalization contract at every fixture SF so
the next regeneration fails loudly in CI instead of at the driver.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql.types import TimestampType

from java_iceberg_table_spark.fixtures import load_table

ALL_SF_DIRS = [
    d
    for d in (
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    )
    if os.path.isdir(d)
]


@pytest.mark.parametrize("sf", ALL_SF_DIRS)
def test_events_ts_is_ltz_timestamp(spark, sf):
    """load_table must normalize events.ts to TIMESTAMP (LTZ) — the type
    watermarks, unix_micros, and session windows require — regardless
    of how the parquet fixture spells it (ns-long, NTZ, or LTZ)."""
    schema = load_table(spark, sf, "events").schema
    assert isinstance(schema["ts"].dataType, TimestampType), (
        f"{sf}: events.ts is {schema['ts'].dataType}; fixtures.load_table "
        "must cast to TIMESTAMP (LTZ) or every event-time operator breaks"
    )


def test_staged_stream_source_is_ltz(spark, sf_dir):
    """The staged stream-source parquet (what every I-group query
    re-reads) must also carry LTZ — file_stream additionally relabels
    NTZ defensively, and a watermark on the result must analyze."""
    from java_iceberg_table_spark.streaming.jobs import file_stream, shared_events_src

    src, batch_df = shared_events_src(spark, sf_dir, n_files=4)
    assert isinstance(batch_df.schema["ts"].dataType, TimestampType)
    stream = file_stream(spark, src, 2).withWatermark("ts", "10 minutes")
    assert isinstance(stream.schema["ts"].dataType, TimestampType)
