"""End-to-end table-maintenance lifecycle: streaming ingest creates
the small-files problem, then the maintenance chain (compact →
z-order → retention delete → snapshot expiry → orphan GC) repairs it
while readers stay correct at every step — the operational loop a
100 TB deployment runs continuously."""

from __future__ import annotations

import glob
import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from java_iceberg_table_spark.fixtures import load_table
from java_iceberg_table_spark.streaming.jobs import (
    shared_events_src,
    stream_append_to_table,
)
from java_iceberg_table_spark.table import create_table, truncate

WIDTH = 300_000_000  # the reference's 5-minute bucket


@pytest.fixture()
def lifecycle_base():
    base = tempfile.mkdtemp(prefix="lifecycle_")
    yield base
    shutil.rmtree(base, ignore_errors=True)


def _content_sig(spark, tbl):
    row = (
        tbl.scan(spark)
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("event_id").alias("sid"),
            F.sum(F.unix_micros("ts")).alias("sts"),
        )
        .collect()[0]
    )
    return (row["cnt"], row["sid"], row["sts"])


def test_full_maintenance_lifecycle(spark, sf_dir, lifecycle_base):
    root = lifecycle_base + "/t"
    src, batch_df = shared_events_src(spark, sf_dir, n_files=4)
    schema = spark.read.parquet(src).schema
    # the staged source may be NTZ; the engine column must be LTZ to
    # mirror the fixture contract
    from pyspark.sql.types import StructField, StructType, TimestampType

    fields = [
        StructField(f.name, TimestampType(), f.nullable)
        if f.dataType.typeName() == "timestamp_ntz"
        else f
        for f in schema.fields
    ]
    tbl = create_table(
        root,
        StructType(fields),
        partition=truncate("event_id", 1000),
    )

    # 1) streaming ingestion: one commit per micro-batch -> many
    #    snapshots, many small files
    stream_append_to_table(spark, src, tbl, max_files_per_trigger=1)
    n_snaps_ingest = len(tbl.snapshots())
    assert n_snaps_ingest >= 4
    sig = _content_sig(spark, tbl)
    n_files_ingest = len(tbl.plan_files())

    # 2) compaction: fewer files, identical content
    stats = tbl.compact_data_files(spark, target_file_bytes=128 * 1024 * 1024)
    assert stats["rewritten"] >= 2
    assert len(tbl.plan_files()) < n_files_ingest
    assert _content_sig(spark, tbl) == sig

    # 3) z-order rewrite on (user_id, event_id): content identical,
    #    both dimensions prune
    tbl.rewrite_clustered(spark, ["user_id", "event_id"], n_files=4)
    assert _content_sig(spark, tbl) == sig
    n_all = len(tbl.plan_files())
    mx = tbl.scan(spark).agg(F.max("user_id"), F.max("event_id")).collect()[0]
    assert (
        len(tbl.plan_files([("user_id", "<", (int(mx[0]) + 1) // 10)])) < n_all
    )

    # 4) aligned retention delete: exactly the oldest bucket vanishes,
    #    metadata-only
    buckets = sorted(
        {e["partition"] for e in tbl.plan_files() if e["partition"] is not None}
    )
    cutoff = buckets[0] + 1000
    tbl.delete_where("event_id", "<", cutoff)
    kept = tbl.scan(spark)
    assert kept.filter(F.col("event_id") < cutoff).count() == 0
    expect_cnt = batch_df.filter(F.col("event_id") >= cutoff).count()
    assert kept.count() == expect_cnt

    # 5) snapshot expiry + orphan GC: history shrinks, dead data files
    #    leave the disk, the current snapshot still reads correctly
    n_before = len(tbl.snapshots())
    tbl.expire_snapshots(older_than_ms=10**18, retain_last=1)
    assert len(tbl.snapshots()) < n_before
    tbl.clean(older_than_ms=0, now_ms=10**18)
    live = {os.path.join(tbl.root, e["path"]) for e in tbl.plan_files()}
    on_disk = set(
        glob.glob(os.path.join(root, "data", "**", "*.parquet"), recursive=True)
    )
    assert on_disk == live  # nothing dead left, nothing live lost
    assert kept.count() == expect_cnt
