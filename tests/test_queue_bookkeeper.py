"""Queue-driven bookkeeper v2 (reference R15-R18): event parse/filter
pipeline, footer-stats recovery, capped batch commit."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from java_iceberg_table_spark.ingest.queue_bookkeeper import (
    QueueBookkeeper,
    make_blob_created_message,
    parse_messages,
)
from java_iceberg_table_spark.ingest.writer import Writer
from java_iceberg_table_spark.table import create_table, truncate

WIDTH = 300_000_000

SCHEMA = StructType(
    [
        StructField("message_id", LongType(), False),
        StructField("data", StringType(), True),
        StructField("timestamp", __import__("pyspark.sql.types", fromlist=["TimestampType"]).TimestampType(), True),
        StructField("timeperiod_loadedBy", LongType(), True),
        StructField("message_body", __import__("pyspark.sql.types", fromlist=["BinaryType"]).BinaryType(), True),
    ]
)


def test_parse_filters_and_url_rewrite(spark):
    host = "acct.dfs.core.windows.net"
    msgs = [
        make_blob_created_message(f"https://{host}/cont/data/__pb=0/f1.parquet"),
        make_blob_created_message(f"https://{host}/cont/data/__pb=0/f2.parquet", api="Flush"),  # wrong api
        make_blob_created_message(f"https://{host}/cont/other/f3.parquet"),  # not /data/
        make_blob_created_message(f"https://{host}/cont/data/f4.avro"),  # avro: rejected (reference reads it with the parquet reader — a bug we don't copy)
        "bm90IGpzb24=",  # junk base64 ("not json")
    ]
    raw = spark.createDataFrame([(m,) for m in msgs], "message string")
    got = parse_messages(raw).collect()
    assert len(got) == 1
    assert got[0]["blob_path"] == "data/__pb=0/f1.parquet"
    assert got[0]["abfss_url"] == f"abfss://cont@{host}/data/__pb=0/f1.parquet"


def test_queue_commit_flow(spark, tmp_path):
    root = str(tmp_path / "t")
    tbl = create_table(root, SCHEMA, partition=truncate("timeperiod_loadedBy", WIDTH))
    w = Writer(tbl, writer_id=0, seed=7)
    entries = w.create_data_files(n_files=4, rows_per_file=25, timeperiod_us=WIDTH)
    host = "acct.dfs.core.windows.net"
    msgs = [
        make_blob_created_message(f"https://{host}/cont/{e['path']}", size=e["bytes"])
        for e in entries
    ]
    raw = spark.createDataFrame([(m,) for m in msgs], "message string")
    qb = QueueBookkeeper(tbl)
    m = qb.process_messages(raw)
    assert m["files"] == 4 and m["rows"] == 100
    got = tbl.scan(spark)
    assert got.count() == 100
    # footer-stats recovery filled real column metrics + partition
    for e in tbl.current_files():
        assert e["partition"] == WIDTH
        assert e["columns"]["message_id"]["min"] is not None
    # partition pruning works on recovered metadata
    assert tbl.scan(spark, [("timeperiod_loadedBy", "<", WIDTH)]).count() == 0


def test_batch_cap(spark, tmp_path):
    root = str(tmp_path / "t")
    tbl = create_table(root, SCHEMA, partition=truncate("timeperiod_loadedBy", WIDTH))
    w = Writer(tbl, writer_id=0, seed=9)
    entries = w.create_data_files(n_files=6, rows_per_file=2, timeperiod_us=0)
    host = "h"
    raw = spark.createDataFrame(
        [(make_blob_created_message(f"https://{host}/c/{e['path']}"),) for e in entries],
        "message string",
    )
    qb = QueueBookkeeper(tbl, batch_cap=4)  # the 500-moniker cap, scaled down
    assert qb.process_messages(raw)["files"] == 4
