"""Group J — UDF/UDAF/UDTF surface as oracle-checked queries.

Every UDF result is checked against an equivalent pure-SQL DuckDB
formulation, so the Python/Arrow crossing itself is under the gate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fixtures import load_table
from ..functions.udfs import (
    TokenSplitter,
    charge_vec,
    price_band,
    weighted_mean,
    zscore_by_group,
)
from . import register


@register(
    "j1_scalar_udf",
    oracle="""
SELECT CASE WHEN o_totalprice > 200000 THEN 'big'
            WHEN o_totalprice > 50000 THEN 'mid'
            ELSE 'small' END AS band,
       COUNT(*) AS cnt
FROM orders GROUP BY 1 ORDER BY 1
""",
    group="J",
)
def j1_scalar_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.withColumn("band", price_band("o_totalprice"))
        .groupBy("band")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("band")
    )


@register(
    "j2_pandas_udf",
    oracle="""
SELECT ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS total_charge
FROM lineitem
""",
    group="J",
)
def j2_pandas_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        charge_vec("l_extendedprice", "l_discount", "l_tax").alias("charge")
    ).agg(F.round(F.sum("charge"), 2).alias("total_charge"))


@register(
    "j3_apply_in_pandas",
    oracle="""
SELECT c_nationkey, id, ROUND(z, 4) AS z FROM (
  SELECT c_nationkey, c_custkey AS id,
         CASE WHEN STDDEV_SAMP(c_acctbal) OVER (PARTITION BY c_nationkey) > 0
              THEN (c_acctbal - AVG(c_acctbal) OVER (PARTITION BY c_nationkey))
                   / STDDEV_SAMP(c_acctbal) OVER (PARTITION BY c_nationkey)
              ELSE 0.0 END AS z
  FROM customer
) ORDER BY c_nationkey, id LIMIT 500
""",
    group="J",
)
def j3_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map z-score normalization; the oracle reformulates the
    same math as SQL window aggregates."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_nationkey", F.col("c_custkey").alias("id"), "c_acctbal"
    )
    z = zscore_by_group(cust, "c_nationkey", "c_acctbal")
    return (
        z.select("c_nationkey", "id", F.round("z", 4).alias("z"))
        .orderBy("c_nationkey", "id")
        .limit(500)
    )


@register(
    "j4_pandas_udaf",
    oracle="""
SELECT l_returnflag,
       ROUND(SUM(l_extendedprice * l_quantity) / SUM(l_quantity), 4) AS wmean
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
    group="J",
)
def j4_pandas_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(F.round(weighted_mean("l_extendedprice", "l_quantity"), 4).alias("wmean"))
        .orderBy("l_returnflag")
    )


@register(
    "j5_udtf",
    oracle="""
SELECT token, COUNT(*)::BIGINT AS cnt
FROM (SELECT UNNEST(str_split(text, ' ')) AS token FROM documents)
GROUP BY token ORDER BY cnt DESC, token LIMIT 20
""",
    group="J",
)
def j5_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF token splitter; must reproduce the built-in
    explode/split result (h3) exactly."""
    docs = load_table(spark, sf_dir, "documents")
    spark.udtf.register("token_splitter", TokenSplitter)
    docs.createOrReplaceTempView("_j5_docs")
    return spark.sql(
        """
        SELECT t.token, COUNT(*) AS cnt
        FROM _j5_docs d, LATERAL token_splitter(d.text) t
        GROUP BY t.token ORDER BY cnt DESC, token LIMIT 20
        """
    )


@register(
    "j6_arrow_optimized_udf",
    oracle="""
SELECT ROUND(SUM(sqrt(o_totalprice) * ln(o_totalprice)), 4) AS checksum,
       COUNT(*) AS cnt
FROM orders WHERE o_totalprice > 0
""",
    group="J",
)
def j6_arrow_optimized_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized Python scalar UDF (Spark 3.5+/4 ``useArrow``):
    same @udf authoring surface as j1, but values cross the JVM/Python
    boundary as Arrow columnar batches instead of pickled rows —
    measured 10-100x less serialization overhead for numeric work.
    When a function can't be a pandas_udf verbatim (row-wise logic,
    scalar libraries), useArrow=True is the cheap upgrade. Result must
    equal the pure-SQL formulation, so the Arrow crossing itself is
    under the oracle gate."""
    import math

    @F.udf("double", useArrow=True)
    def score(p: float) -> float:
        return math.sqrt(p) * math.log(p)

    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 0)
    return orders.agg(
        F.round(F.sum(score("o_totalprice")), 4).alias("checksum"),
        F.count(F.lit(1)).alias("cnt"),
    )
