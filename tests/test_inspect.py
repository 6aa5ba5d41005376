"""Metadata inspection tables: files / partitions / manifests /
snapshots / refs as DataFrames, all computed without opening data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from java_iceberg_table_spark.table import create_table, truncate


@pytest.fixture()
def tbl(spark, tmp_path):
    df = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    t = create_table(str(tmp_path / "t"), df.schema, partition=truncate("k", 25))
    t.append(df)
    t.append(
        spark.range(100, 120).select(F.col("id").alias("k"), F.lit(7).alias("v"))
    )
    return t


def test_files_df_matches_plan_files(spark, tbl):
    fdf = tbl.inspect(spark, "files")
    entries = tbl.plan_files()
    got = {
        r["file_path"]: (r["partition"], r["record_count"], r["file_size_bytes"])
        for r in fdf.collect()
    }
    assert got == {
        e["path"]: (e["partition"], e["rows"], e["bytes"]) for e in entries
    }
    # bounds arrive as stringified footer stats; a bucket may hold
    # several files (parallel writers), so check the bucket-wide range
    rows = fdf.filter(F.col("partition") == 0).collect()
    assert min(int(r["lower_bounds"]["k"]) for r in rows) == 0
    assert max(int(r["upper_bounds"]["k"]) for r in rows) == 24
    assert all(r["null_counts"]["k"] == 0 for r in rows)


def test_partitions_df_totals(spark, tbl):
    parts = {r["partition"]: r for r in tbl.inspect(spark, "partitions").collect()}
    assert set(parts) == {0, 25, 50, 75, 100}
    assert parts[0]["record_count"] == 25
    assert parts[100]["record_count"] == 20
    assert all(r["file_count"] >= 1 for r in parts.values())
    total_rows = sum(r["record_count"] for r in parts.values())
    assert total_rows == tbl.scan(spark).count() == 120


def test_manifests_df_and_snapshots_df(spark, tbl):
    snaps = tbl.inspect(spark, "snapshots").orderBy("committed_at_ms").collect()
    assert [s["operation"] for s in snaps] == ["append", "append"]
    assert snaps[0]["parent_id"] is None
    assert snaps[1]["parent_id"] == snaps[0]["snapshot_id"]
    assert snaps[1]["is_current"] and not snaps[0]["is_current"]
    mdf = tbl.inspect(spark, "manifests").collect()
    assert len(mdf) == len(tbl.metadata.current_snapshot().manifests)
    assert sum(r["record_count"] for r in mdf) == 120


def test_time_travel_and_ref_inspection(spark, tbl):
    first = tbl.snapshots()[0].snapshot_id
    tbl.create_tag("v1", first)
    assert (
        tbl.inspect(spark, "files", snapshot_id=first).count()
        == tbl.inspect(spark, "files", ref="v1").count()
        == len(tbl.files_of(tbl.snapshot_by_id(first)))
    )
    refs = tbl.inspect(spark, "refs").collect()
    assert [(r["name"], r["type"], r["snapshot_id"]) for r in refs] == [
        ("v1", "tag", first)
    ]


def test_empty_table_and_unknown_kind(spark, tmp_path):
    t = create_table(
        str(tmp_path / "e"), spark.range(1).selectExpr("id as k").schema
    )
    assert t.inspect(spark, "files").count() == 0
    assert t.inspect(spark, "partitions").count() == 0
    with pytest.raises(KeyError, match="unknown inspection"):
        t.inspect(spark, "nope")
