"""EngineTableDataSource (Python Data Source API): batch read/write,
filter-driven partition pruning, time travel, streaming tail and
exactly-once streaming write — the connector surface end to end."""

from __future__ import annotations

import shutil
import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from java_iceberg_table_spark.fixtures import load_table
from java_iceberg_table_spark.sources import register_engine_datasource
from java_iceberg_table_spark.table import create_table
from java_iceberg_table_spark.table import load_table as open_table


@pytest.fixture(scope="module")
def ds(spark):
    register_engine_datasource(spark)
    return spark


@pytest.fixture()
def base_dir():
    d = tempfile.mkdtemp(prefix="ds_test_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_batch_write_then_read_roundtrip(ds, sf_dir, base_dir):
    spark = ds
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal", "c_mktsegment"
    )
    root = base_dir + "/t"
    create_table(root, cust.schema)
    cust.write.format("engine_table").option("root", root).mode("append").save()
    df = spark.read.format("engine_table").option("root", root).load()
    assert df.count() == cust.count()
    got = df.filter(F.col("c_acctbal") > 1000).count()
    assert got == cust.filter(F.col("c_acctbal") > 1000).count()
    # connector write committed one snapshot readable by the table API
    assert open_table(root).scan(spark).count() == cust.count()


def test_filter_prunes_connector_partitions(ds, sf_dir, base_dir):
    spark = ds
    from java_iceberg_table_spark.sources.engine_datasource import (
        EngineBatchReader,
    )

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    root = base_dir + "/t"
    tbl = create_table(root, li.schema)
    tbl.append(li)
    tbl.rewrite_clustered(spark, ["l_partkey", "l_suppkey"], n_files=8)
    mx = li.agg(F.max("l_partkey")).collect()[0][0]
    thr = (int(mx) + 1) // 10
    reader = EngineBatchReader(root, tbl.schema(), {})
    n_all = len(reader.partitions())
    from pyspark.sql.datasource import LessThan

    unsupported = list(reader.pushFilters([LessThan(("l_partkey",), thr)]))
    assert len(unsupported) == 1  # reported back for JVM re-evaluation
    n_pruned = len(reader.partitions())
    assert n_pruned < n_all  # manifest pruning reached the connector
    # and the end-to-end result is still exact
    df = spark.read.format("engine_table").option("root", root).load()
    assert (
        df.filter(F.col("l_partkey") < thr).count()
        == li.filter(F.col("l_partkey") < thr).count()
    )


def test_time_travel_option(ds, sf_dir, base_dir):
    spark = ds
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    root = base_dir + "/t"
    tbl = create_table(root, cust.schema)
    s1 = tbl.append(cust.limit(100))
    tbl.append(cust)
    old = (
        spark.read.format("engine_table")
        .option("root", root)
        .option("snapshot_id", str(s1.snapshot_id))
        .load()
    )
    assert old.count() == 100


def test_overwrite_mode_rejected(ds, sf_dir, base_dir):
    spark = ds
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    root = base_dir + "/t"
    create_table(root, cust.schema)
    with pytest.raises(Exception, match="append-only"):
        cust.write.format("engine_table").option("root", root).mode(
            "overwrite"
        ).save()


def test_stream_read_tails_commits(ds, sf_dir, base_dir):
    spark = ds
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    root = base_dir + "/t"
    tbl = create_table(root, cust.schema)
    tbl.append(cust.filter(F.col("c_custkey") % 2 == 0))
    tbl.append(cust.filter(F.col("c_custkey") % 2 == 1))
    name = "m_" + uuid.uuid4().hex[:8]
    ckpt = tempfile.mkdtemp(prefix="ckpt_dsr_")
    try:
        q = (
            spark.readStream.format("engine_table")
            .option("root", root)
            .load()
            .writeStream.format("memory")
            .queryName(name)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        assert spark.table(name).count() == cust.count()
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)


def test_stream_write_exactly_once(ds, sf_dir, base_dir):
    spark = ds
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    src_root = base_dir + "/src"
    dst_root = base_dir + "/dst"
    src = create_table(src_root, cust.schema)
    src.append(cust)
    create_table(dst_root, cust.schema)
    ckpt = tempfile.mkdtemp(prefix="ckpt_dsw_")
    try:
        q = (
            spark.readStream.format("engine_table")
            .option("root", src_root)
            .load()
            .writeStream.format("engine_table")
            .option("root", dst_root)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        dst = open_table(dst_root)
        assert dst.scan(spark).count() == cust.count()
        # epoch high-watermark stamped into the snapshot summary
        assert any(
            "streaming-batch-id" in s.summary for s in dst.snapshots()
        )
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
