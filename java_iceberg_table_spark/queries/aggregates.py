"""Group D — aggregations (SURVEY.md §2.2 D).

Each query is written with the DataFrame API; Catalyst plans a partial
(map-side) + final hash aggregate automatically, so these shapes scale:
the shuffle carries only group keys × partial states, never raw rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fixtures import load_table
from . import register

R = 4  # canonical float rounding (FIXTURES.md §5)


@register(
    "d1_tpch_q1",
    oracle="""
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 4)                                        AS sum_qty,
       ROUND(SUM(l_extendedprice), 4)                                   AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4)                AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 4)  AS sum_charge,
       ROUND(AVG(l_quantity), 4)                                        AS avg_qty,
       ROUND(AVG(l_extendedprice), 4)                                   AS avg_price,
       ROUND(AVG(l_discount), 4)                                        AS avg_disc,
       COUNT(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
    group="D",
)
def d1_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: multi-measure hash aggregate with filter pushdown.

    The shipdate predicate reaches the parquet scan (PushedFilters) and
    only the 8 referenced columns are read (ReadSchema).
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), R).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), R).alias("sum_base_price"),
            F.round(F.sum(disc_price), R).alias("sum_disc_price"),
            F.round(F.sum(charge), R).alias("sum_charge"),
            F.round(F.avg("l_quantity"), R).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), R).alias("avg_price"),
            F.round(F.avg("l_discount"), R).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )
