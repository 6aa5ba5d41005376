"""Z-order clustering: Morton-code properties, rewrite invariants,
and the two-dimensional pruning win a linear sort can't deliver."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from java_iceberg_table_spark.table import create_table
from java_iceberg_table_spark.table import load_table as open_table
from java_iceberg_table_spark.table.zorder import ZBITS, minmax, zvalue_expr


def _zvals(spark, pairs):
    df = spark.createDataFrame(pairs, "a long, b long")
    mins, maxs = minmax(df, ["a", "b"])
    out = df.withColumn("z", zvalue_expr(["a", "b"], mins, maxs))
    return {(r["a"], r["b"]): r["z"] for r in out.collect()}


def test_zvalue_monotone_per_axis(spark):
    # Morton code is monotone in each coordinate with the other fixed
    pairs = [(a, b) for a in range(0, 64, 7) for b in range(0, 64, 7)]
    z = _zvals(spark, pairs)
    avals = sorted({a for a, _ in pairs})
    bvals = sorted({b for _, b in pairs})
    for b in bvals:
        zs = [z[(a, b)] for a in avals]
        assert zs == sorted(zs)
    for a in avals:
        zs = [z[(a, b)] for b in bvals]
        assert zs == sorted(zs)


def test_zvalue_interleaves_both_dims(spark):
    # ordering by z must NOT equal ordering by either single column
    # (that would mean one dimension dominates = no interleaving)
    pairs = [(a, b) for a in range(8) for b in range(8)]
    z = _zvals(spark, pairs)
    by_z = sorted(pairs, key=lambda p: z[p])
    assert by_z != sorted(pairs, key=lambda p: (p[0], p[1]))
    assert by_z != sorted(pairs, key=lambda p: (p[1], p[0]))


def test_zvalue_rejects_too_many_dims():
    with pytest.raises(ValueError):
        zvalue_expr(
            ["a", "b", "c", "d"],
            {c: 0 for c in "abcd"},
            {c: 1 for c in "abcd"},
        )
    # 3 dims (48 bits) still fit a long
    zvalue_expr(["a", "b", "c"], {c: 0 for c in "abc"}, {c: 1 for c in "abc"})
    assert 3 * ZBITS < 64


@pytest.fixture()
def zorder_table(spark, sf_dir):
    from java_iceberg_table_spark.fixtures import load_table

    base = tempfile.mkdtemp(prefix="zorder_test_")
    root = base + "/t"
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    tbl = create_table(root, li.schema)
    tbl.append(li)
    yield tbl, li
    import shutil

    shutil.rmtree(base, ignore_errors=True)


def test_rewrite_clustered_content_identical(spark, zorder_table):
    tbl, li = zorder_table
    before = tbl.scan(spark).groupBy().agg(
        F.count(F.lit(1)), F.sum("l_quantity"), F.sum("l_partkey"), F.sum("l_suppkey")
    ).collect()
    stats = tbl.rewrite_clustered(spark, ["l_partkey", "l_suppkey"], n_files=8)
    assert stats["new_files"] >= 2
    after = tbl.scan(spark).groupBy().agg(
        F.count(F.lit(1)), F.sum("l_quantity"), F.sum("l_partkey"), F.sum("l_suppkey")
    ).collect()
    assert before == after
    snap = tbl.metadata.current_snapshot()
    assert snap.operation == "replace"
    assert snap.delete_manifests == []


def test_rewrite_clustered_prunes_both_dims(spark, zorder_table):
    tbl, li = zorder_table
    mx = li.agg(F.max("l_partkey"), F.max("l_suppkey")).collect()[0]
    thr_pk, thr_sk = (mx[0] + 1) // 10, (mx[1] + 1) // 10
    tbl.rewrite_clustered(spark, ["l_partkey", "l_suppkey"], n_files=8)
    n_all = len(tbl.plan_files())
    n_pk = len(tbl.plan_files([("l_partkey", "<", thr_pk)]))
    n_sk = len(tbl.plan_files([("l_suppkey", "<", thr_sk)]))
    # a 10% predicate on EITHER dimension must skip files; before the
    # rewrite neither could (arrival order = full-range stats per file)
    assert n_pk < n_all and n_sk < n_all
    # and the content under pruning is exact
    expect = li.filter(F.col("l_partkey") < thr_pk).count()
    assert tbl.scan(spark, [("l_partkey", "<", thr_pk)]).count() == expect


def test_rewrite_clustered_applies_pending_mor_deletes(spark, sf_dir):
    from java_iceberg_table_spark.fixtures import load_table

    base = tempfile.mkdtemp(prefix="zorder_mor_")
    root = base + "/t"
    try:
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_partkey", "l_suppkey", "l_quantity"
        ).limit(1000)
        tbl = create_table(root, li.schema)
        tbl.append(li)
        tbl.delete_eq_mor(spark, li.filter(F.col("l_partkey") < 5).select("l_partkey"), ["l_partkey"])
        survivors = tbl.scan(spark).count()
        tbl.rewrite_clustered(spark, ["l_partkey", "l_suppkey"], n_files=4)
        assert tbl.scan(spark).count() == survivors
        assert tbl.scan(spark).filter(F.col("l_partkey") < 5).count() == 0
    finally:
        import shutil

        shutil.rmtree(base, ignore_errors=True)
