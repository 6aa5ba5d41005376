"""Group F — sorts, limits, top-k, set operations (SURVEY.md §2.2 F).

Scale notes: F2's sort+limit compiles to TakeOrderedAndProject (per-
partition top-k + driver merge — no global sort); F1 keeps the same
property via limit pushdown. Set ops shuffle on the full row as key;
UNION ALL is shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fixtures import load_table
from . import register


@register(
    "f1_multikey_sort_limit",
    oracle="""
SELECT o_orderkey FROM orders
ORDER BY o_orderdate DESC, o_orderkey ASC
LIMIT 100
""",
    group="F",
)
def f1_multikey_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey")
        .limit(100)
    )


@register(
    "f2_topk",
    oracle="""
SELECT p_partkey, p_retailprice FROM part
ORDER BY p_retailprice DESC, p_partkey
LIMIT 10
""",
    group="F",
)
def f2_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return (
        part.orderBy(F.col("p_retailprice").desc(), F.col("p_partkey"))
        .select("p_partkey", "p_retailprice")
        .limit(10)
    )


@register(
    "f4_union_all",
    oracle="""
SELECT COUNT(*) AS cnt FROM (
  SELECT c_nationkey AS k FROM customer
  UNION ALL
  SELECT s_nationkey FROM supplier
)
""",
    group="F",
)
def f4_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    sup = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return cust.unionAll(sup).agg(F.count(F.lit(1)).alias("cnt"))


@register(
    "f5_union_distinct",
    oracle="""
SELECT COUNT(*) AS cnt FROM (
  SELECT c_nationkey AS k FROM customer
  UNION
  SELECT s_nationkey FROM supplier
)
""",
    group="F",
)
def f5_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    sup = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return cust.union(sup).distinct().agg(F.count(F.lit(1)).alias("cnt"))


@register(
    "f6_intersect",
    oracle="""
SELECT c_nationkey AS k FROM customer
INTERSECT
SELECT s_nationkey FROM supplier
ORDER BY 1
""",
    group="F",
)
def f6_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    sup = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("k"))
    return cust.intersect(sup).orderBy("k")


@register(
    "f7_except",
    oracle="""
SELECT n_nationkey AS k FROM nation
EXCEPT
SELECT c_nationkey FROM customer
ORDER BY 1
""",
    group="F",
)
def f7_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation").select(F.col("n_nationkey").alias("k"))
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("k"))
    return nation.subtract(cust).orderBy("k")  # subtract == SQL EXCEPT (distinct)


@register(
    "f8_limit_offset",
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey
LIMIT 25 OFFSET 50
""",
    group="F",
)
def f8_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pagination: ORDER BY + LIMIT/OFFSET (DataFrame.offset, Spark
    3.4+). The total order with a key tie-break makes page contents
    deterministic; physically this stays a top-(offset+limit) per
    partition + final trim, never a full global sort."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .offset(50)
        .limit(25)
    )


@register(
    "f3_per_group_topk",
    oracle="""
SELECT c_nationkey AS grp, c_custkey AS key, rn FROM (
  SELECT c_nationkey, c_custkey,
         ROW_NUMBER() OVER (
           PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
         ) AS rn
  FROM customer
) WHERE rn <= 4
ORDER BY grp, rn
""",
    group="F",
)
def f3_per_group_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k (SURVEY §2.2 F3 — declared as 'E1 doubles as
    this'; own entry so the row grades directly). One hash shuffle on
    the group key, then Spark's WindowGroupLimit pushes the rn<=k cut
    below the sort so each partition keeps only k rows — no global
    sort, no full materialization of ranked rows. The e1 plan, over a
    different table/key so both shapes stay covered."""
    from pyspark.sql.window import Window

    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        cust.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 4)
        .select(
            F.col("c_nationkey").alias("grp"),
            F.col("c_custkey").alias("key"),
            F.col("rn").cast("long").alias("rn"),
        )
        .orderBy("grp", "rn")
    )
