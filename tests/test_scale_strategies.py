"""Scale-strategy tests: salted joins/aggregates equal their plain
formulations; bucketed tables co-locate joins (no Exchange in plan)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from java_iceberg_table_spark.fixtures import load_table
from java_iceberg_table_spark.operators.skew import salted_aggregate, salted_join


def test_salted_join_equals_plain(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    big = orders.select(F.col("o_custkey").alias("c_custkey"), "o_totalprice")
    plain = (
        big.join(cust, "c_custkey")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("o_totalprice"), 2).alias("s"))
    )
    salted = (
        salted_join(big, cust, "c_custkey", salts=8)
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("cnt"), F.round(F.sum("o_totalprice"), 2).alias("s"))
    )
    assert sorted(plain.collect()) == sorted(salted.collect())


def test_salted_join_outer_equals_plain(spark, sf_dir):
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"), "o_orderkey"
    )
    plain = (
        cust.join(orders, "c_custkey", "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("cnt"))
    )
    # left side of the outer join is the salted (big) side
    salted = (
        salted_join(cust, orders.distinct(), "c_custkey", salts=4, how="left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("cnt"))
    )
    # NB: salting replicates the small side; for LEFT joins the plain
    # and salted row multiplicity only matches when the small side is
    # distinct per (key, payload) — asserted here by construction
    assert sorted(plain.collect()) == sorted(salted.collect())


def test_salted_aggregate_equals_plain(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    plain = {
        r["l_returnflag"]: (round(r["s"], 4), r["c"])
        for r in li.groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("s"), F.count(F.lit(1)).alias("c"))
        .collect()
    }
    salted = {
        r["l_returnflag"]: (round(r["sum_v"], 4), r["cnt_v"])
        for r in salted_aggregate(li, "l_returnflag", "l_quantity", salts=8).collect()
    }
    assert plain == salted


def test_bucketed_join_avoids_shuffle(spark, sf_dir, tmp_path):
    """Pre-bucketing both sides on the join key removes the shuffle:
    the co-located join strategy for repeated big-big joins at scale."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    (
        orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", str(tmp_path / "b_orders"))
        .mode("overwrite").saveAsTable("b_orders")
    )
    (
        li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", str(tmp_path / "b_lineitem"))
        .mode("overwrite").saveAsTable("b_lineitem")
    )
    bo = spark.table("b_orders")
    bl = spark.table("b_lineitem")
    joined = bo.join(bl, bo.o_orderkey == bl.l_orderkey).groupBy("o_orderpriority").count()
    plan = joined._sc._jvm.PythonSQLUtils.explainString(
        joined._jdf.queryExecution(), "formatted"
    )
    # no shuffle before the join: both sides are bucket-partitioned
    join_section = plan.split("HashAggregate")[0]
    assert "Exchange" not in join_section.split("== Physical Plan ==")[-1].split("SortMergeJoin")[0]
    # and the result is right
    expected = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderpriority")
        .count()
        .collect()
    )
    assert sorted(joined.collect()) == sorted(expected)


def test_ivf_persisted_index_partition_pruning(spark, sf_dir, tmp_path):
    """The IVF serving path at scale: the inverted file is WRITTEN
    partitioned by cluster, and a query batch reads only its probed
    cells (static partition pruning visible in the plan) — corpus IO
    per query batch is nprobe/n_centroids of the store, not a scan.
    Results through the disk-backed index must equal the in-memory
    index bit-for-bit (parquet round-trips doubles exactly)."""
    from java_iceberg_table_spark.operators.similarity import ivf_build, ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    assigned, cents = ivf_build(emb, n_centroids=8, iters=2)
    path = str(tmp_path / "ivf_store")
    assigned.write.partitionBy("cluster").parquet(path)
    disk = spark.read.parquet(path).select("neighbor_id", "cvec_n", "cluster")

    queries = emb.filter(F.col("vec_id") < 5)
    mem = ivf_topk(emb, queries, k=5, n_centroids=8, nprobe=3, index=(assigned, cents))
    dsk = ivf_topk(emb, queries, k=5, n_centroids=8, nprobe=3, index=(disk, cents))
    key = lambda r: (r["query_id"], r["rn"])
    assert sorted(map(tuple, mem.collect()), key=lambda t: (t[0], t[-1])) == \
           sorted(map(tuple, dsk.collect()), key=lambda t: (t[0], t[-1]))

    # pruning is real: an explicit probe-cell filter reaches the scan
    # as PartitionFilters and the files read shrink accordingly
    probe = disk.filter(F.col("cluster").isin([1, 3]))
    plan = probe._sc._jvm.PythonSQLUtils.explainString(
        probe._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan and "cluster" in plan
    n_probed = probe.select(F.input_file_name()).distinct().count()
    n_all = (
        spark.read.parquet(path).select(F.input_file_name()).distinct().count()
    )
    assert 0 < n_probed < n_all
