"""Schema evolution: add/drop column are metadata-only commits; old
files project onto the new schema (missing -> NULL, dropped -> not
read); time travel reads each snapshot under the schema it was
committed with (snapshot->schema_id binding, as in Iceberg)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from java_iceberg_table_spark.table import create_table
from java_iceberg_table_spark.table.table import load_table


def _mk(spark, tmp_path):
    tbl = create_table(
        str(tmp_path / "t"),
        spark.createDataFrame([(1, "a")], "id long, name string").schema,
    )
    tbl.append(spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string"))
    return tbl


def test_add_column_old_files_read_null(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    snap1 = tbl.metadata.current_snapshot().snapshot_id
    tbl.add_column("score", "long")
    tbl.append(
        spark.createDataFrame([(3, "c", 30), (4, "d", 40)], "id long, name string, score long")
    )
    rows = {r["id"]: r["score"] for r in tbl.scan(spark).collect()}
    assert rows == {1: None, 2: None, 3: 30, 4: 40}
    # time travel: pre-evolution snapshot reads with its own schema
    old = tbl.scan(spark, snapshot_id=snap1)
    assert old.columns == ["id", "name"]
    assert old.count() == 2
    # schema log is complete and immutable
    md = tbl.metadata
    assert [s["schema_id"] for s in md.schemas] == [0, 1]
    assert md.current_schema_id == 1


def test_drop_column_not_projected(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    snap1 = tbl.metadata.current_snapshot().snapshot_id
    tbl.drop_column("name")
    assert tbl.scan(spark).columns == ["id"]
    # the bytes still exist: time travel surfaces the dropped column
    assert tbl.scan(spark, snapshot_id=snap1).columns == ["id", "name"]
    # appends after the drop carry the narrow schema
    tbl.append(spark.createDataFrame([(9,)], "id long"))
    assert sorted(r["id"] for r in tbl.scan(spark).collect()) == [1, 2, 9]


def test_evolution_guards(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    with pytest.raises(ValueError, match="already exists"):
        tbl.add_column("name", "string")
    with pytest.raises(ValueError, match="no such column"):
        tbl.drop_column("nope")
    tbl.drop_column("name")
    with pytest.raises(ValueError, match="last column"):
        tbl.drop_column("id")


def test_evolution_survives_maintenance(spark, tmp_path):
    """Compaction and retention rebuild metadata; the schema log and
    snapshot schema ids must survive the round trip."""
    from java_iceberg_table_spark.table.transforms import truncate

    tbl = create_table(
        str(tmp_path / "t2"),
        spark.createDataFrame([(1, 10)], "id long, bucket long").schema,
        partition=truncate("bucket", 100),
    )
    tbl.append(spark.createDataFrame([(1, 10), (2, 250)], "id long, bucket long"))
    tbl.add_column("tag", "string")
    tbl.append(
        spark.createDataFrame([(3, 310, "x")], "id long, bucket long, tag string")
    )
    tbl.delete_where("bucket", "<", 100)
    md = tbl.metadata
    assert md.current_schema_id == 1
    assert md.current_snapshot().schema_id == 1
    rows = {r["id"]: r["tag"] for r in tbl.scan(spark).collect()}
    assert rows == {2: None, 3: "x"}
    # reload from disk: the log is durable, not an in-memory artifact
    tbl2 = load_table(tbl.root)
    assert [s["schema_id"] for s in tbl2.metadata.schemas] == [0, 1]
