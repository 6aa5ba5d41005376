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


def test_rename_column_coalesces_vintages(spark, tmp_path):
    """rename_column is metadata-only: files written under the old
    name project onto the new name via the name-history coalesce, new
    appends use the new name, and time travel reads each snapshot
    under the names of its day."""
    tbl = _mk(spark, tmp_path)
    snap1 = tbl.metadata.current_snapshot().snapshot_id
    tbl.rename_column("name", "label")
    assert tbl.scan(spark).columns == ["id", "label"]
    tbl.append(spark.createDataFrame([(3, "c")], "id long, label string"))
    rows = {r["id"]: r["label"] for r in tbl.scan(spark).collect()}
    assert rows == {1: "a", 2: "b", 3: "c"}
    # time travel: pre-rename snapshot uses the old name
    old = tbl.scan(spark, snapshot_id=snap1)
    assert old.columns == ["id", "name"]
    # chained rename keeps the whole history readable
    tbl.rename_column("label", "title")
    rows = {r["id"]: r["title"] for r in tbl.scan(spark).collect()}
    assert rows == {1: "a", 2: "b", 3: "c"}
    # filters and pruning still work on the current name
    assert tbl.scan(spark, [("id", "<", 3)]).count() == 2


def test_rename_guards(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    tbl.rename_column("name", "label")
    with pytest.raises(ValueError, match="retired"):
        tbl.add_column("name", "string")  # old physical name reserved
    with pytest.raises(ValueError, match="already exists"):
        tbl.rename_column("label", "id")
    with pytest.raises(ValueError, match="no such column"):
        tbl.rename_column("nope", "x")
    tbl.add_column("fresh", "string")  # unrelated names still fine


def test_rename_keeps_eq_deletes_applying(spark, tmp_path):
    """An equality delete recorded under the old column name must keep
    hiding its rows after the rename (the delete entry's key columns
    translate through the name history)."""
    tbl = _mk(spark, tmp_path)
    tbl.append(spark.createDataFrame([(3, "c"), (4, "d")], "id long, name string"))
    keys = spark.createDataFrame([("b",), ("c",)], "name string")
    tbl.delete_eq_mor(spark, keys, ["name"])
    assert sorted(r["id"] for r in tbl.scan(spark).collect()) == [1, 4]
    tbl.rename_column("name", "label")
    assert sorted(r["id"] for r in tbl.scan(spark).collect()) == [1, 4]
    # and a delete under the NEW name also applies
    tbl.delete_eq_mor(spark, spark.createDataFrame([("d",)], "label string"), ["label"])
    assert sorted(r["id"] for r in tbl.scan(spark).collect()) == [1]
    # rewrite materializes the mixed-name delete set correctly
    tbl.rewrite_deletes(spark)
    assert sorted(r["id"] for r in tbl.scan(spark).collect()) == [1]


def test_widen_column_int_to_long(spark, tmp_path):
    """widen_column is metadata-only: int32 files read natively under
    the widened long schema; unsafe changes are refused."""
    tbl = create_table(
        str(tmp_path / "w"),
        spark.createDataFrame([(1, 1.5)], "k int, v float").schema,
    )
    tbl.append(spark.createDataFrame([(1, 1.5), (2, 2.5)], "k int, v float"))
    tbl.widen_column("k", "long")
    tbl.widen_column("v", "double")
    sch = {f.name: f.dataType.simpleString() for f in tbl.schema().fields}
    assert sch == {"k": "bigint", "v": "double"}
    tbl.append(
        spark.createDataFrame([(3_000_000_000, 3.5)], "k long, v double")
    )
    got = {r["k"]: r["v"] for r in tbl.scan(spark).collect()}
    assert set(got) == {1, 2, 3_000_000_000}
    assert abs(got[2] - 2.5) < 1e-6
    with pytest.raises(ValueError, match="unsafe"):
        tbl.widen_column("k", "integer")  # narrowing refused
    with pytest.raises(ValueError, match="unsafe"):
        tbl.widen_column("v", "float")


def test_rename_and_widen_on_avro_table(spark, tmp_path):
    """Schema evolution composes with the R5 avro format toggle: the
    position-aware decode types absent-vintage columns as nulls and
    re-types widened ints through Arrow."""
    tbl = create_table(
        str(tmp_path / "a"),
        spark.createDataFrame([(1, "a", 10)], "id int, name string, sc int").schema,
        properties={"write.format.default": "avro"},
    )
    tbl.append(
        spark.createDataFrame([(1, "a", 10), (2, "b", 20)], "id int, name string, sc int")
    )
    tbl.rename_column("name", "label")
    tbl.widen_column("id", "long")
    tbl.append(
        spark.createDataFrame([(3, "c", 30)], "id long, label string, sc int")
    )
    rows = {r["id"]: (r["label"], r["sc"]) for r in tbl.scan(spark).collect()}
    assert rows == {1: ("a", 10), 2: ("b", 20), 3: ("c", 30)}
    # MOR delete keyed on the renamed column still composes
    tbl.delete_eq_mor(spark, spark.createDataFrame([("b",)], "label string"), ["label"])
    assert sorted(r["id"] for r in tbl.scan(spark).collect()) == [1, 3]


def test_append_spanning_a_rename_commit(spark, tmp_path):
    """A writer that serialized its data files BEFORE a concurrent
    rename commits AFTER it: the files physically carry the old column
    name, the table schema already carries the new one — the files are
    simply old-vintage, and the name-history read maps them correctly.
    (This is why the rename needs no writer coordination.)"""
    tbl = _mk(spark, tmp_path)
    # stage data files under the pre-rename schema, commit later
    pending = tbl._write_data_files(
        spark.createDataFrame([(10, "x"), (11, "y")], "id long, name string")
    )
    tbl.rename_column("name", "label")
    tbl.append_entries(pending)  # the racing writer's commit lands
    rows = {r["id"]: r["label"] for r in tbl.scan(spark).collect()}
    assert rows == {1: "a", 2: "b", 10: "x", 11: "y"}


def test_add_column_initial_default(spark, tmp_path):
    """add_column(default=...) — Iceberg v3 initial-default: the
    default applies ONLY to rows physically written before the column
    existed (selected by entry sequence number); explicit NULLs
    written afterwards stay NULL; time travel predating the add has no
    such column; MOR deletes anti-join on physical values first;
    compaction materializes the default and preserves content."""
    tbl = _mk(spark, tmp_path)
    s1 = tbl.metadata.current_snapshot()
    tbl.add_column("status", "string", default="active")
    tbl.append(
        spark.createDataFrame(
            [(3, "c", "new"), (4, "d", None)], "id long, name string, status string"
        )
    )
    out = {r["id"]: r["status"] for r in tbl.scan(spark).collect()}
    assert out == {1: "active", 2: "active", 3: "new", 4: None}
    # vintage schema predates the column entirely
    assert tbl.scan(spark, snapshot_id=s1.snapshot_id).columns == ["id", "name"]
    # an equality delete composes (physical values: old rows keyed by id)
    tbl.delete_eq_mor(spark, spark.createDataFrame([(1,), (3,)], "id long"), ["id"])
    out2 = {r["id"]: r["status"] for r in tbl.scan(spark).collect()}
    assert out2 == {2: "active", 4: None}
    # compaction rewrites old files: the default MATERIALIZES, content equal
    tbl.compact_data_files(spark)
    assert {r["id"]: r["status"] for r in tbl.scan(spark).collect()} == out2
    # numeric defaults + simpleString dtype names accepted
    tbl.add_column("score", "bigint", default=7)
    got = {r["id"]: (r["status"], r["score"]) for r in tbl.scan(spark).collect()}
    assert got == {2: ("active", 7), 4: (None, 7)}
    # non-scalar defaults refused
    with pytest.raises(ValueError, match="JSON scalar"):
        tbl.add_column("bad", "string", default=["x"])


def test_initial_default_through_connector(spark, tmp_path):
    """The connector's executor-side read paths (batch aligned-arrow,
    MOR-masked pandas, CDC) apply initial defaults per FILE — parity
    with Table.scan, including under delete state."""
    from java_iceberg_table_spark.sources import register_engine_datasource

    register_engine_datasource(spark)
    root = str(tmp_path / "c")
    df = spark.createDataFrame([(i, f"v{i}") for i in range(10)], "id long, name string")
    tbl = create_table(root, df.schema)
    tbl.append(df)
    tbl.add_column("status", "string", default="active")
    tbl.append(
        spark.createDataFrame(
            [(100, "x", None), (101, "y", "set")], "id long, name string, status string"
        )
    )
    tbl.delete_eq_mor(spark, spark.createDataFrame([(2,), (100,)], "id long"), ["id"])
    want = sorted(
        (r["id"], r["name"], r["status"]) for r in tbl.scan(spark).collect()
    )
    got = sorted(
        (r["id"], r["name"], r["status"])
        for r in spark.read.format("engine_table").option("root", root).load().collect()
    )
    assert got == want
    assert (100, "x", None) not in got and (2, "v2", "active") not in got
    assert (5, "v5", "active") in got and (101, "y", "set") in got
    # avro-format files take the pandas decode path: same parity
    tbl.set_properties({"write.format.default": "avro"})
    tbl.add_column("grade", "bigint", default=3)
    tbl.append(
        spark.createDataFrame(
            [(200, "z", "s", 9)], "id long, name string, status string, grade long"
        )
    )
    want2 = sorted(
        tuple(r) for r in tbl.scan(spark).select("id", "status", "grade").collect()
    )
    got2 = sorted(
        tuple(r)
        for r in spark.read.format("engine_table").option("root", root).load()
        .select("id", "status", "grade").collect()
    )
    assert got2 == want2
    assert (200, "s", 9) in got2 and (5, "active", 3) in got2
