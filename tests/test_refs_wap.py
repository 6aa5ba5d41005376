"""Snapshot refs: branches (write-audit-publish) and tags.

Staged writes on a branch never move the table head; publish is a
fast-forward that refuses divergent heads; refs are GC roots for
snapshot expiry; tags pin a snapshot forever."""

from __future__ import annotations

import pytest

from java_iceberg_table_spark.table import create_table
from java_iceberg_table_spark.table.format import CommitConflict


def _mk(spark, tmp_path, name="t"):
    tbl = create_table(
        str(tmp_path / name),
        spark.createDataFrame([(1, "a")], "id long, v string").schema,
    )
    tbl.append(spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string"))
    return tbl


def test_wap_stage_audit_publish(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    tbl.create_branch("audit")
    tbl.append(spark.createDataFrame([(3, "c")], "id long, v string"), branch="audit")
    tbl.append(spark.createDataFrame([(4, "d")], "id long, v string"), branch="audit")
    # table readers see only published data
    assert tbl.scan(spark).count() == 2
    # the branch sees the staged writes
    staged = sorted(r["id"] for r in tbl.scan(spark, ref="audit").collect())
    assert staged == [1, 2, 3, 4]
    # audit passed -> publish = fast-forward
    tbl.publish_branch("audit")
    assert sorted(r["id"] for r in tbl.scan(spark).collect()) == [1, 2, 3, 4]


def test_publish_refuses_divergence(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    tbl.create_branch("audit")
    tbl.append(spark.createDataFrame([(3, "c")], "id long, v string"), branch="audit")
    # head moves off the branch lineage (a direct append)
    tbl.append(spark.createDataFrame([(9, "z")], "id long, v string"))
    with pytest.raises(CommitConflict, match="does not descend"):
        tbl.publish_branch("audit")


def test_tag_pins_snapshot_and_survives_expiry(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    tagged = tbl.metadata.current_snapshot().snapshot_id
    tbl.create_tag("train-v1")
    for i in range(3):
        tbl.append(spark.createDataFrame([(10 + i, "x")], "id long, v string"))
    # expire everything old; keep only the most recent
    tbl.expire_snapshots(older_than_ms=2**62, retain_last=1)
    ids = {s.snapshot_id for s in tbl.snapshots()}
    assert tagged in ids  # the tag pinned it
    assert tbl.scan(spark, ref="train-v1").count() == 2  # reproducible read
    # tags reject writes
    with pytest.raises(ValueError, match="tag"):
        tbl.append(spark.createDataFrame([(99, "q")], "id long, v string"), branch="train-v1")


def test_ref_management_guards(spark, tmp_path):
    tbl = _mk(spark, tmp_path)
    tbl.create_branch("b1")
    with pytest.raises(ValueError, match="already exists"):
        tbl.create_branch("b1")
    with pytest.raises(KeyError):
        tbl.scan(spark, ref="nope")
    tbl.drop_ref("b1")
    with pytest.raises(KeyError):
        tbl.scan(spark, ref="b1")


def test_rollback_to_restores_and_is_reversible(spark, sf_dir):
    import tempfile, shutil
    from pyspark.sql import functions as F
    from java_iceberg_table_spark.fixtures import load_table
    from java_iceberg_table_spark.table import create_table

    base = tempfile.mkdtemp(prefix="rb_")
    try:
        cust = load_table(spark, sf_dir, "customer").select("c_custkey")
        tbl = create_table(base + "/t", cust.schema)
        s1 = tbl.append(cust.limit(100))
        s2 = tbl.append(cust)
        n2 = tbl.scan(spark).count()
        tbl.rollback_to(s1.snapshot_id)
        assert tbl.scan(spark).count() == 100
        # instantly reversible: the newer snapshot is still in the log
        tbl.rollback_to(s2.snapshot_id)
        assert tbl.scan(spark).count() == n2
        # unknown id and no-op rollback fail loudly
        import pytest as _pytest

        with _pytest.raises(KeyError):
            tbl.rollback_to(123456789)
        with _pytest.raises(ValueError):
            tbl.rollback_to(s2.snapshot_id)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_ref_retention_expiry(spark, tmp_path):
    """Round 14: refs past their age limit stop being GC roots —
    expire_snapshots drops them FIRST, then normal reachability GC
    collects the history they pinned (Iceberg per-ref max-ref-age-ms;
    Reaper.java:17-27 generalized to refs)."""
    import os
    import time

    tbl = _mk(spark, tmp_path)
    head = tbl.metadata.current_snapshot_id
    tbl.create_branch("wip", max_ref_age_ms=0)
    tbl.create_branch("keep")
    tbl.create_tag("pin")
    tbl.append(
        spark.createDataFrame([(7, "staged")], "id long, v string"),
        branch="wip",
    )
    staged_snap = tbl.metadata.refs["wip"]["snapshot_id"]
    staged_paths = [
        os.path.join(tbl.root, e["path"])
        for e in tbl.added_files(tbl.snapshot_by_id(staged_snap))
    ]
    assert all(os.path.exists(p) for p in staged_paths)
    time.sleep(0.01)
    import java_iceberg_table_spark.table.format as fmt

    res = tbl.expire_snapshots(
        older_than_ms=fmt.now_ms(), retain_last=0, spark=spark
    )
    assert res["expired_refs"] == 1
    refs = tbl.metadata.refs
    assert "wip" not in refs and "keep" in refs and "pin" in refs
    # the staged-only snapshot aged out with its ref; its file is gone
    assert all(
        s.snapshot_id != staged_snap for s in tbl.metadata.snapshots
    )
    assert res["deleted_files"] >= 1
    assert not any(os.path.exists(p) for p in staged_paths)
    assert tbl.metadata.current_snapshot_id == head  # head untouched


def test_ref_retention_table_default_exempts_tags(spark, tmp_path):
    import time

    import java_iceberg_table_spark.table.format as fmt

    tbl = _mk(spark, tmp_path)
    tbl.create_branch("b1")
    tbl.create_tag("t1")
    tbl.set_properties({"history.expire.max-ref-age-ms": "0"})
    time.sleep(0.01)
    res = tbl.expire_snapshots(older_than_ms=0, retain_last=0, spark=spark)
    assert res["expired_refs"] == 1  # the branch; the tag is exempt
    assert set(tbl.metadata.refs) == {"t1"}
    # opting tags in drops them too
    tbl.set_properties({"history.expire.ref-age-applies-to-tags": "true"})
    time.sleep(0.01)
    res = tbl.expire_snapshots(older_than_ms=0, retain_last=0, spark=spark)
    assert res["expired_refs"] == 1
    assert tbl.metadata.refs == {}
    # a fresh explicit retention wins over the table default
    tbl.create_tag("t2", max_ref_age_ms=3_600_000)
    time.sleep(0.01)
    res = tbl.expire_snapshots(older_than_ms=0, retain_last=0, spark=spark)
    assert res["expired_refs"] == 0 and "t2" in tbl.metadata.refs
