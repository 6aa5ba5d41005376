"""R5: the avro data-file toggle (Constants.java:16, Writer.java:92-96)
via the pure-Python OCF implementation in sources/avro_io.py —
binary-encoding roundtrip, the writer->bookkeeper->scan pipeline with
``write.format.default=avro``, and parquet/avro coexistence in one
table."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from java_iceberg_table_spark.ingest.bookkeeper import Bookkeeper
from java_iceberg_table_spark.ingest.writer import Writer, make_records
from java_iceberg_table_spark.sources.avro_io import (
    avro_schema_of,
    read_ocf,
    spark_schema_of,
    write_ocf,
)
from java_iceberg_table_spark.table import create_table, truncate

WIDTH = 300_000_000

FULL_SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("name", StringType(), True),
        StructField("score", DoubleType(), True),
        StructField("ok", BooleanType(), True),
        StructField("blob", BinaryType(), True),
        StructField("ts", TimestampType(), True),
    ]
)

ROWS = [
    {"id": 1, "name": "a", "score": 1.5, "ok": True, "blob": b"\x00\xff", "ts": 1_700_000_000_000_000},
    {"id": 2, "name": None, "score": None, "ok": None, "blob": None, "ts": None},
    {"id": -3, "name": "é世", "score": -2.25, "ok": False, "blob": b"", "ts": 0},
    {"id": 2**62, "name": "big", "score": 1e300, "ok": True, "blob": b"xyz", "ts": -1},
]


def test_ocf_roundtrip_all_types(tmp_path):
    path = str(tmp_path / "r.avro")
    schema = avro_schema_of(FULL_SCHEMA)
    write_ocf(path, ROWS, schema)
    got_schema, got_rows = read_ocf(path)
    assert got_schema == schema
    assert got_rows == ROWS
    # schema map is invertible
    assert spark_schema_of(schema).fieldNames() == FULL_SCHEMA.fieldNames()


def test_ocf_empty_file(tmp_path):
    path = str(tmp_path / "e.avro")
    write_ocf(path, [], avro_schema_of(FULL_SCHEMA))
    _, rows = read_ocf(path)
    assert rows == []


def test_avro_writer_pipeline_matches_parquet(spark):
    """Same seeds, both formats: the avro-backed table must scan to the
    identical row set as the parquet-backed one (R5 toggle parity)."""
    results = {}
    for file_format in ("parquet", "avro"):
        base = tempfile.mkdtemp(prefix=f"avro_t_{file_format}_")
        root = base + "/t"
        try:
            from java_iceberg_table_spark.ingest.writer import EVENTS_SCHEMA
            from pyspark.sql.types import StructType as ST

            tbl = create_table(
                root,
                ST.fromJson(
                    {
                        "type": "struct",
                        "fields": [
                            {"name": "message_id", "type": "long", "nullable": False, "metadata": {}},
                            {"name": "data", "type": "string", "nullable": True, "metadata": {}},
                            {"name": "timestamp", "type": "timestamp", "nullable": True, "metadata": {}},
                            {"name": "timeperiod_loadedBy", "type": "long", "nullable": True, "metadata": {}},
                            {"name": "message_body", "type": "binary", "nullable": True, "metadata": {}},
                        ],
                    }
                ),
                partition=truncate("timeperiod_loadedBy", WIDTH),
                properties={"write.format.default": file_format},
            )
            w = Writer(tbl, writer_id=0, seed=7)
            assert w.file_format == file_format
            w.run_iteration(n_files=3, rows_per_file=40, timeperiod_us=WIDTH * 4)
            Bookkeeper(tbl).run_once()
            pdf = (
                tbl.scan(spark)
                .select("message_id", "data", "timeperiod_loadedBy", "message_body")
                .orderBy("message_id")
                .toPandas()
            )
            results[file_format] = pdf
        finally:
            shutil.rmtree(base, ignore_errors=True)
    pq_pdf, av_pdf = results["parquet"], results["avro"]
    assert len(av_pdf) == 120
    assert pq_pdf.equals(av_pdf)


def test_avro_partition_pruned_scan(spark):
    """Avro entries prune by partition/stats exactly like parquet ones
    (pruning is metadata-plane, format-agnostic)."""
    base = tempfile.mkdtemp(prefix="avro_prune_")
    root = base + "/t"
    try:
        from pyspark.sql.types import StructType as ST

        schema = ST.fromJson(
            {
                "type": "struct",
                "fields": [
                    {"name": "message_id", "type": "long", "nullable": False, "metadata": {}},
                    {"name": "data", "type": "string", "nullable": True, "metadata": {}},
                    {"name": "timestamp", "type": "timestamp", "nullable": True, "metadata": {}},
                    {"name": "timeperiod_loadedBy", "type": "long", "nullable": True, "metadata": {}},
                    {"name": "message_body", "type": "binary", "nullable": True, "metadata": {}},
                ],
            }
        )
        tbl = create_table(
            root, schema, partition=truncate("timeperiod_loadedBy", WIDTH),
            properties={"write.format.default": "avro"},
        )
        w = Writer(tbl, writer_id=0, seed=9)
        for k in range(3):  # three partitions
            entries = w.create_data_files(1, 10, timeperiod_us=k * WIDTH)
            tbl.append_entries(entries)
        pruned = tbl.plan_files([("timeperiod_loadedBy", ">=", 2 * WIDTH)])
        assert len(pruned) == 1
        n = tbl.scan(spark, filters=[("timeperiod_loadedBy", ">=", 2 * WIDTH)]).count()
        assert n == 10
        assert tbl.scan(spark).count() == 30
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_unsupported_format_rejected():
    base = tempfile.mkdtemp(prefix="avro_bad_")
    root = base + "/t"
    try:
        from pyspark.sql.types import StructType as ST

        schema = ST.fromJson(
            {
                "type": "struct",
                "fields": [
                    {"name": "message_id", "type": "long", "nullable": False, "metadata": {}}
                ],
            }
        )
        tbl = create_table(root, schema)
        with pytest.raises(ValueError, match="unsupported data-file format"):
            Writer(tbl, file_format="orc")
    finally:
        shutil.rmtree(base, ignore_errors=True)
