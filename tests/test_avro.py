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


def test_avro_append_with_nulls_and_timestamps(spark):
    """Nullable long/timestamp columns with nulls survive the avro
    append path (pandas turns int-with-NaN into float64; the encoder
    must keep ints integral and nulls as None), and the manifest stats
    record timestamp min/max as ISO strings exactly like the parquet
    footer path — pruning on mixed-format tables compares like-typed
    bounds."""
    import datetime as dt

    import tempfile
    import shutil

    from java_iceberg_table_spark.table import create_table

    base = tempfile.mkdtemp(prefix="avro_nulls_")
    try:
        df = spark.createDataFrame(
            [
                (1, 100, dt.datetime(2024, 1, 1)),
                (2, None, dt.datetime(2024, 1, 2)),
                (3, 300, None),
            ],
            "k long, n long, ts timestamp",
        )
        tbl = create_table(
            base + "/t", df.schema, properties={"write.format.default": "avro"}
        )
        tbl.append(df.coalesce(1))
        got = {r["k"]: (r["n"], r["ts"]) for r in tbl.scan(spark).collect()}
        assert got[1] == (100, dt.datetime(2024, 1, 1))
        assert got[2][0] is None and got[2][1] == dt.datetime(2024, 1, 2)
        assert got[3] == (300, None)
        (entry,) = tbl.current_files()
        ts_stats = entry["columns"]["ts"]
        assert isinstance(ts_stats["min"], str)  # ISO, like parquet footers
        assert ts_stats["min"].startswith("2024-01-01")
        n_stats = entry["columns"]["n"]
        assert n_stats["min"] == 100 and n_stats["max"] == 300  # ints, not floats
        assert n_stats["nulls"] == 1
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_avro_append_respects_target_file_size(spark):
    """write.target-file-size-bytes caps avro files too: the second
    append (once a bytes/row estimate exists) splits into multiple
    container files instead of one unbounded file per task."""
    import tempfile
    import shutil

    from pyspark.sql import functions as F

    from java_iceberg_table_spark.table import create_table

    base = tempfile.mkdtemp(prefix="avro_cap_")
    try:
        df = spark.range(4_000).select(
            F.col("id").alias("k"), F.lit("x" * 50).alias("v")
        )
        tbl = create_table(
            base + "/t",
            df.schema,
            properties={
                "write.format.default": "avro",
                "write.target-file-size-bytes": "20000",
            },
        )
        tbl.append(df.coalesce(1))  # first append: no estimate yet -> 1 file
        n1 = len(tbl.current_files())
        tbl.append(df.coalesce(1))  # sized append: must split by rows
        n2 = len(tbl.current_files())
        assert n2 - n1 > 1
        assert tbl.scan(spark).count() == 8_000
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_connector_reads_avro_table(spark):
    """The engine_table batch connector reads avro-format tables (the
    R5 toggle composes with the Python Data Source path)."""
    import tempfile
    import shutil

    from java_iceberg_table_spark.sources import register_engine_datasource
    from java_iceberg_table_spark.table import create_table

    register_engine_datasource(spark)
    base = tempfile.mkdtemp(prefix="avro_conn_")
    try:
        df = spark.createDataFrame(
            [(i, f"v{i}") for i in range(50)], "k long, v string"
        )
        tbl = create_table(
            base + "/t", df.schema, properties={"write.format.default": "avro"}
        )
        tbl.append(df)
        got = (
            spark.read.format("engine_table")
            .option("root", base + "/t")
            .load()
        )
        assert sorted(r["k"] for r in got.collect()) == list(range(50))
    finally:
        shutil.rmtree(base, ignore_errors=True)
