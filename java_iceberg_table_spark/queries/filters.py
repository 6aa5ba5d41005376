"""Group B — projections, filters, predicates (SURVEY.md §2.2 B).

All predicates here are Catalyst-pushable: comparisons, IN, NULL
checks, LIKE and RLIKE reach the parquet scan as PushedFilters, so at
scale these queries touch only surviving row groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fixtures import load_table
from . import register


@register(
    "b1_arithmetic_projection",
    oracle="""
SELECT l_orderkey,
       CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,4))
                  * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))
                  * (CAST(1 AS DECIMAL(6,4)) + CAST(l_tax AS DECIMAL(6,4))), 4) AS DOUBLE) AS charge
FROM lineitem
ORDER BY l_orderkey, l_linenumber, l_extendedprice, l_partkey, l_suppkey
LIMIT 500
""",
    group="B",
)
def b1_arithmetic_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Money arithmetic in DECIMAL: 2-dp inputs make the product exact
    at 6 dp, so ~half the rows sit exactly on a .xxxx5 boundary where
    double rounding differs between engines (observed at sf0.1).
    Decimal multiply+round is exact and engine-identical."""
    li = load_table(spark, sf_dir, "lineitem")
    one = F.lit(1).cast("decimal(6,4)")
    charge = (
        F.col("l_extendedprice").cast("decimal(18,4)")
        * (one - F.col("l_discount").cast("decimal(6,4)"))
        * (one + F.col("l_tax").cast("decimal(6,4)"))
    )
    return (
        li.orderBy("l_orderkey", "l_linenumber", "l_extendedprice", "l_partkey", "l_suppkey")
        .select("l_orderkey", F.round(charge, 4).cast("double").alias("charge"))
        .limit(500)
    )


@register(
    "b2_boolean_predicates",
    oracle="""
SELECT COUNT(*) AS cnt FROM lineitem
WHERE l_quantity > 30 AND l_discount BETWEEN 0.02 AND 0.08 AND l_returnflag <> 'A'
""",
    group="B",
)
def b2_boolean_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_quantity") > 30)
        & F.col("l_discount").between(0.02, 0.08)
        & (F.col("l_returnflag") != "A")
    ).agg(F.count(F.lit(1)).alias("cnt"))


@register(
    "b3_in_predicate",
    oracle="""
SELECT COUNT(*) AS cnt FROM orders
WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
""",
    group="B",
)
def b3_in_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")).agg(
        F.count(F.lit(1)).alias("cnt")
    )


@register(
    "b4_null_predicates",
    oracle="SELECT COUNT(*) AS cnt FROM customer WHERE c_acctbal IS NOT NULL",
    group="B",
)
def b4_null_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.filter(F.col("c_acctbal").isNotNull()).agg(F.count(F.lit(1)).alias("cnt"))


@register(
    "b5_like_rlike",
    oracle="""
SELECT
  (SELECT COUNT(*) FROM part WHERE p_type LIKE '%BRASS%') AS cnt_like,
  (SELECT COUNT(*) FROM part WHERE regexp_matches(p_name, '^[a-f].*[0-9]$')) AS cnt_rlike
""",
    group="B",
)
def b5_like_rlike(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.agg(
        F.sum(F.when(F.col("p_type").like("%BRASS%"), 1).otherwise(0)).alias("cnt_like"),
        F.sum(F.when(F.col("p_name").rlike("^[a-f].*[0-9]$"), 1).otherwise(0)).alias("cnt_rlike"),
    )


@register(
    "b6_case_when",
    oracle="""
SELECT o_orderstatus,
       CASE WHEN o_totalprice > 200000 THEN 'big'
            WHEN o_totalprice > 50000 THEN 'mid'
            ELSE 'small' END AS sz,
       COUNT(*) AS cnt
FROM orders
GROUP BY 1, 2
ORDER BY 1, 2
""",
    group="B",
)
def b6_case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    sz = (
        F.when(F.col("o_totalprice") > 200000, "big")
        .when(F.col("o_totalprice") > 50000, "mid")
        .otherwise("small")
    )
    return (
        orders.withColumn("sz", sz)
        .groupBy("o_orderstatus", "sz")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("o_orderstatus", "sz")
    )


@register(
    "b7_distinct",
    oracle="""
SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem ORDER BY 1, 2
""",
    group="B",
)
def b7_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select("l_returnflag", "l_linestatus")
        .distinct()
        # <= 6 flag x status combinations: one-task in-partition sort,
        # no range exchange (c3 convention, round 15)
        .coalesce(1)
        .sortWithinPartitions("l_returnflag", "l_linestatus")
    )
