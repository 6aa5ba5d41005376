"""Row-level change feed (Table.changes_between): manifest-diff fast
path, MOR-delete windows, rewrite fallback, and the defining invariant
scan(from) + inserts − deletes == scan(to)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from java_iceberg_table_spark.fixtures import load_table
from java_iceberg_table_spark.table import create_table, truncate


@pytest.fixture()
def ev_slice(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "events")
        .select("event_id", "user_id")
        .filter(F.col("event_id") < 2000)
    )


@pytest.fixture()
def tmp_root():
    base = tempfile.mkdtemp(prefix="cdc_")
    yield base + "/t"
    shutil.rmtree(base, ignore_errors=True)


def _sig(df):
    return {
        (r["event_id"], r["user_id"], r.asDict().get("_change_type"))
        for r in df.collect()
    }


def test_append_only_window_is_manifest_diff(spark, ev_slice, tmp_root):
    tbl = create_table(tmp_root, ev_slice.schema)
    s0 = tbl.append(ev_slice.filter(F.col("event_id") % 2 == 0))
    tbl.append(ev_slice.filter(F.col("event_id") % 2 == 1))
    ch = tbl.changes_between(spark, s0.snapshot_id)
    assert ch.filter(F.col("_change_type") == "delete").count() == 0
    got = {r["event_id"] for r in ch.collect()}
    expect = {
        r["event_id"] for r in ev_slice.filter(F.col("event_id") % 2 == 1).collect()
    }
    assert got == expect


def test_metadata_delete_window(spark, ev_slice, tmp_root):
    tbl = create_table(
        tmp_root, ev_slice.schema, partition=truncate("event_id", 500)
    )
    s0 = tbl.append(ev_slice)
    tbl.delete_where("event_id", "<", 500)
    ch = tbl.changes_between(spark, s0.snapshot_id)
    assert ch.filter(F.col("_change_type") == "insert").count() == 0
    dels = {r["event_id"] for r in ch.collect()}
    assert dels == {
        r["event_id"] for r in ev_slice.filter(F.col("event_id") < 500).collect()
    }


def test_mor_delete_and_append_window(spark, ev_slice, tmp_root):
    tbl = create_table(tmp_root, ev_slice.schema)
    s0 = tbl.append(ev_slice.filter(F.col("event_id") % 2 == 0))
    tbl.append(ev_slice.filter(F.col("event_id") % 2 == 1))
    keys = ev_slice.filter(F.col("event_id") % 5 == 0).select("event_id")
    tbl.delete_eq_mor(spark, keys, ["event_id"])
    ch = tbl.changes_between(spark, s0.snapshot_id)
    ins = {r["event_id"] for r in ch.filter(F.col("_change_type") == "insert").collect()}
    dels = {r["event_id"] for r in ch.filter(F.col("_change_type") == "delete").collect()}
    # inserts: odd rows visible at TO (i.e. not %5); deletes: even %5
    # rows that were visible at FROM
    base = {r["event_id"] for r in ev_slice.collect()}
    assert ins == {e for e in base if e % 2 == 1 and e % 5 != 0}
    assert dels == {e for e in base if e % 2 == 0 and e % 5 == 0}


def test_rewrite_window_falls_back_to_content_diff(spark, ev_slice, tmp_root):
    tbl = create_table(tmp_root, ev_slice.schema)
    s0 = tbl.append(ev_slice)
    # compaction rewrites files but changes no content -> empty diff
    tbl.append(ev_slice.limit(0))  # no-op append keeps chain appendy
    tbl.rewrite_clustered(spark, ["event_id", "user_id"], n_files=2)
    ch = tbl.changes_between(spark, s0.snapshot_id)
    assert ch.count() == 0


def test_cdc_invariant_random_window(spark, ev_slice, tmp_root):
    tbl = create_table(tmp_root, ev_slice.schema)
    s0 = tbl.append(ev_slice.filter(F.col("event_id") % 3 == 0))
    tbl.append(ev_slice.filter(F.col("event_id") % 3 == 1))
    tbl.delete_eq_mor(
        spark, ev_slice.filter(F.col("event_id") % 7 == 0).select("event_id"), ["event_id"]
    )
    tbl.append(ev_slice.filter(F.col("event_id") % 3 == 2))
    ch = tbl.changes_between(spark, s0.snapshot_id)
    from_rows = _sig(tbl.scan(spark, snapshot_id=s0.snapshot_id))
    to_rows = _sig(tbl.scan(spark))
    ins = {(e, u) for e, u, t in _sig(ch) if t == "insert"}
    dels = {(e, u) for e, u, t in _sig(ch) if t == "delete"}
    from_pairs = {(e, u) for e, u, _ in from_rows}
    to_pairs = {(e, u) for e, u, _ in to_rows}
    assert (from_pairs | ins) - dels == to_pairs
    assert not (ins & dels)


def test_cdc_across_rename_window(spark, tmp_root):
    """A rename inside the CDC window: both diff paths read the
    from-side under the to-side schema, so the feed carries the
    CURRENT column names and the invariant still holds."""
    df = spark.createDataFrame(
        [(i, f"v{i}") for i in range(10)], "id long, name string"
    )
    tbl = create_table(tmp_root, df.schema)
    s0 = tbl.append(df.filter(F.col("id") < 5))
    tbl.rename_column("name", "label")
    tbl.append(
        spark.createDataFrame(
            [(i, f"v{i}") for i in range(5, 10)], "id long, label string"
        )
    )
    # manifest-diff path (append-only window)
    ch = tbl.changes_between(spark, s0.snapshot_id)
    assert "label" in ch.columns and "name" not in ch.columns
    assert sorted(r["id"] for r in ch.collect()) == [5, 6, 7, 8, 9]
    # force the content-diff path with a rewrite in the window
    tbl.delete_rows(spark, [("id", "<", 2)])  # overwrite op
    ch2 = tbl.changes_between(spark, s0.snapshot_id)
    rows = ch2.collect()
    ins = {r["id"] for r in rows if r["_change_type"] == "insert"}
    dels = {r["id"] for r in rows if r["_change_type"] == "delete"}
    # from-side {0..4}, to-side {2..9}: 2-4 are unchanged common rows
    assert ins == {5, 6, 7, 8, 9}
    assert dels == {0, 1}
    assert "label" in ch2.columns and "name" not in ch2.columns
