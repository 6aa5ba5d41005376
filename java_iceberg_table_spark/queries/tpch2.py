"""TPC-H-shaped composites, part 2 (Q4/Q6/Q7/Q12-Q17/Q19/Q21/Q22
shapes adapted to the fixture star schema — no partsupp table, so
lineitem bridges part<->supplier; no shipmode/commitdate columns, so
equivalent predicates use the columns that exist).

These widen optimizer coverage beyond tpch.py's join-agg-topk shapes:
semi joins (EXISTS), anti joins (NOT IN / NOT EXISTS), correlated
scalar subqueries (per-group avg/min), uncorrelated scalar subqueries
(global max / threshold), conditional aggregation (CASE inside SUM),
OR-of-ANDs predicate pushdown, and outer-join distributions.

Money math follows the repo rule (README): sums/products of 2-dp money
run in DECIMAL (exact, order-independent), then round + cast double.
Scalar-subquery *comparisons* against aggregates are rewritten to stay
exact: revenue equality uses decimal (q15), and "above average" uses
``value * count > total`` in decimal (q22) instead of comparing against
a double AVG whose last ulp is summation-order-dependent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fixtures import load_table
from . import register
from .tpch import _revenue_agg


def _dec_revenue_col():
    one = F.lit(1).cast("decimal(6,4)")
    return F.col("l_extendedprice").cast("decimal(18,4)") * (
        one - F.col("l_discount").cast("decimal(6,4)")
    )


@register(
    "q4_order_priority",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    group="TPCH",
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS -> left-semi join. The semi join carries a non-equi
    conjunct (l_shipdate > o_orderdate) next to the equi key, so
    Catalyst plans a sort-merge/hash semi join with the extra condition
    evaluated inline — no row duplication, no distinct needed."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem")
    sem = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return (
        sem.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "q6_revenue_forecast",
    oracle="""
SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                      * CAST(l_discount AS DECIMAL(6,4))), 4) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
""",
    group="TPCH",
)
def q6_revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure scan-filter-aggregate: every predicate reaches the parquet
    scan (PushedFilters), a 4-column ReadSchema, and a single partial+
    final agg — the cheapest possible plan shape at any scale."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice").cast("decimal(18,4)") * F.col("l_discount").cast(
        "decimal(6,4)"
    )
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.round(F.sum(rev), 4).cast("double").alias("revenue"))
    )


@register(
    "q7_volume_shipping",
    oracle="""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                      * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))), 4) AS DOUBLE) AS revenue
FROM lineitem
JOIN supplier ON s_suppkey = l_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
   OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3')
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
""",
    group="TPCH",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two aliases of the same broadcast dim (nation) with a cross-pair
    disjunction: the nation filters can't be pushed below the joins
    individually (the OR couples the two sides), so it lands as a
    post-join filter — the facts still shuffle only on their keys."""
    li = load_table(spark, sf_dir, "lineitem")
    sup = F.broadcast(load_table(spark, sf_dir, "supplier"))
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    n1 = F.broadcast(
        load_table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
        )
    )
    n2 = F.broadcast(
        load_table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
        )
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    return (
        li.join(sup, li.l_suppkey == sup.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(n1, F.col("s_nationkey") == F.col("n1_key"))
        .join(n2, F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("long").alias("l_year"))
        .agg(_revenue_agg())
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "q12_priority_lines",
    oracle="""
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_linestatus
ORDER BY l_linestatus
""",
    group="TPCH",
)
def q12_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (Q12 shape, priority instead of the
    absent shipmode): one pass, two CASE sums — not two scans."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


@register(
    "q13_customer_distribution",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey) d
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
    group="TPCH",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outer join + two-level aggregation: customers with zero orders
    must survive (COUNT(col) skips the nulls the outer join makes)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "q14_promo_revenue",
    oracle="""
SELECT CAST(ROUND(
         100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                     THEN CAST(l_extendedprice AS DECIMAL(18,4))
                          * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))
                     ELSE CAST(0 AS DECIMAL(24,8)) END) AS DOUBLE)
               / CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                          * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))) AS DOUBLE),
         4) AS DOUBLE) AS promo_revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01' AND l_shipdate < TIMESTAMP '1997-10-01'
""",
    group="TPCH",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio of conditional sum to total sum, single aggregation. Both
    sums are exact decimals; the division happens in double AFTER each
    exact sum is (deterministically) narrowed, so the quotient is
    bit-identical across engines and partitionings."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-09-01") & (F.col("l_shipdate") < "1997-10-01")
    )
    part = F.broadcast(load_table(spark, sf_dir, "part"))
    rev = _dec_revenue_col()
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(
        F.lit(0).cast("decimal(24,8)")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(promo).cast("double")
                / F.sum(rev).cast("double"),
                4,
            ).alias("promo_revenue")
        )
    )


@register(
    "q15_top_supplier",
    oracle="""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM(CAST(l_extendedprice AS DECIMAL(18,4))
             * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, CAST(ROUND(total_rev, 4) AS DOUBLE) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
ORDER BY s_suppkey
""",
    group="TPCH",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery MAX with an equality join back: the equality is
    on an EXACT decimal sum, so "the" max is well-defined — with double
    sums this query is nondeterministic (ties split by summation
    order), which is why the repo's money-in-decimal rule exists."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    rev = (
        li.groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_dec_revenue_col()).alias("total_rev"))
    )
    best = F.broadcast(rev.agg(F.max("total_rev").alias("best_rev")))
    sup = load_table(spark, sf_dir, "supplier")
    return (
        rev.join(best, rev.total_rev == best.best_rev)
        .join(sup, F.col("supplier_no") == sup.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round("total_rev", 4).cast("double").alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


@register(
    "q16_supplier_part_count",
    oracle="""
SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#1'
  AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_size
ORDER BY supplier_cnt DESC, p_brand, p_size
LIMIT 40
""",
    group="TPCH",
)
def q16_supplier_part_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN -> left-anti join (the excluded set is known non-null:
    s_suppkey is a key, so anti join == NOT IN here), then COUNT
    DISTINCT. The anti join's right side broadcasts."""
    li = load_table(spark, sf_dir, "lineitem")
    part = F.broadcast(
        load_table(spark, sf_dir, "part").filter(
            (F.col("p_brand") != "Brand#1")
            & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
        )
    )
    bad_sup = F.broadcast(
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(bad_sup, li.l_suppkey == bad_sup.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_size")
        .limit(40)
    )


@register(
    "q17_small_quantity_revenue",
    oracle="""
SELECT CAST(ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0, 4) AS DOUBLE) AS avg_yearly
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE p_brand = 'Brand#13'
  AND l_quantity < (SELECT 0.2 * AVG(l_quantity)
                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
""",
    group="TPCH",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (per-part average) decorrelated into
    an aggregate + join — what Catalyst does to the SQL form, written
    directly. The avg is over small integers (exact in double, any
    summation order), so the threshold compare is engine-stable.

    Scale note: the per-part avg aggregates the full lineitem before
    joining — at 100 TB the brand filter must NOT be pushed into the
    avg (semantics), but the join is on p_partkey so both sides
    co-partition; the filtered fact side broadcasts its partkey set via
    DPP/runtime filter when the table layer provides stats."""
    li = load_table(spark, sf_dir, "lineitem")
    part = F.broadcast(
        load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13")
    )
    avg_qty = li.groupBy(F.col("l_partkey").alias("avg_pk")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_thresh")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(avg_qty, li.l_partkey == avg_qty.avg_pk)
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).cast("double")
                / 7.0,
                4,
            ).alias("avg_yearly")
        )
    )


@register(
    "q19_discounted_revenue",
    oracle="""
SELECT CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                      * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4)))), 4) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#15' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#17' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)
""",
    group="TPCH",
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR-of-ANDs across both join sides. Catalyst derives the
    single-side implications (p_brand IN (...) AND p_size <= 15;
    l_quantity BETWEEN 1 AND 30) and pushes them into both scans while
    keeping the full disjunction as the post-join filter."""
    li = load_table(spark, sf_dir, "lineitem")
    part = F.broadcast(load_table(spark, sf_dir, "part"))
    def clause(brand, smax, qlo, qhi):
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(1, smax)
            & F.col("l_quantity").between(qlo, qhi)
        )
    cond = (
        clause("Brand#12", 5, 1, 11)
        | clause("Brand#15", 10, 10, 20)
        | clause("Brand#17", 15, 20, 30)
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(F.round(F.sum(_dec_revenue_col()), 4).cast("double").alias("revenue"))
    )


@register(
    "q21_waiting_supplier",
    oracle="""
SELECT s_name, COUNT(*) AS numwait
FROM supplier
JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
JOIN orders ON o_orderkey = l1.l_orderkey
WHERE o_orderstatus = 'F'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > l1.l_shipdate)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
""",
    group="TPCH",
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 shape: EXISTS + NOT EXISTS self-references on the fact table
    (multi-supplier order where this supplier shipped last), as a
    left-semi then left-anti join with mixed equi/non-equi conditions.
    Both probes join on l_orderkey, so all three lineitem instances
    share one shuffle partitioning (Exchange reuse)."""
    sup = F.broadcast(load_table(spark, sf_dir, "supplier"))
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem")
    l1 = li.select("l_orderkey", "l_suppkey", "l_shipdate")
    l2 = li.select(
        F.col("l_orderkey").alias("p2_orderkey"), F.col("l_suppkey").alias("p2_suppkey")
    )
    l3 = li.select(
        F.col("l_orderkey").alias("p3_orderkey"),
        F.col("l_suppkey").alias("p3_suppkey"),
        F.col("l_shipdate").alias("p3_shipdate"),
    )
    waited = (
        l1.join(
            l2,
            (l1.l_orderkey == l2.p2_orderkey) & (l1.l_suppkey != l2.p2_suppkey),
            "left_semi",
        ).join(
            l3,
            (l1.l_orderkey == l3.p3_orderkey)
            & (l1.l_suppkey != l3.p3_suppkey)
            & (l3.p3_shipdate > l1.l_shipdate),
            "left_anti",
        )
    )
    return (
        waited.join(orders, waited.l_orderkey == orders.o_orderkey)
        .join(sup, waited.l_suppkey == sup.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@register(
    "q22_global_sales_opportunity",
    oracle="""
WITH pos AS (SELECT COUNT(*) AS cnt, SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS total
             FROM customer WHERE c_acctbal > 0.0)
SELECT cntrycode, COUNT(*) AS numcust,
       CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,4))), 4) AS DOUBLE) AS totacctbal
FROM (SELECT c_nationkey % 5 AS cntrycode, c_acctbal, c_custkey
      FROM customer, pos
      WHERE CAST(c_acctbal AS DECIMAL(18,4)) * pos.cnt > pos.total
        AND c_nationkey % 5 IN (0, 1, 2, 3)
        AND NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_orderpriority = '1-URGENT')) t
GROUP BY cntrycode
ORDER BY cntrycode
""",
    group="TPCH",
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q22 shape (cntrycode := c_nationkey % 5): above-average account
    balance AND no urgent orders (every fixture customer HAS orders,
    so plain NOT EXISTS would be vacuous). "Above average" is computed as
    ``acctbal * count > sum`` ENTIRELY in decimal/integer — exact, so
    no row can flip sides from double-AVG rounding. NOT EXISTS is a
    left-anti join against the orders custkey set."""
    cust = load_table(spark, sf_dir, "customer")
    pos = F.broadcast(
        cust.filter(F.col("c_acctbal") > 0.0).agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("c_acctbal").cast("decimal(18,4)")).alias("total"),
        )
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return (
        cust.withColumn("cntrycode", F.col("c_nationkey") % 5)
        .filter(F.col("cntrycode").isin(0, 1, 2, 3))
        .crossJoin(pos)
        .filter(F.col("c_acctbal").cast("decimal(18,4)") * F.col("cnt") > F.col("total"))
        .join(orders, F.col("c_custkey") == orders.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(18,4)")), 4)
            .cast("double")
            .alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


@register(
    "q8_national_market_share",
    oracle="""
SELECT o_year,
       ROUND(CAST(SUM(CASE WHEN nation = 'NATION_5' THEN volume ELSE CAST(0 AS DECIMAL(24,4)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
FROM (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
         CAST(l_extendedprice AS DECIMAL(18,4))
           * (CAST(1 AS DECIMAL(6,4)) - CAST(l_discount AS DECIMAL(6,4))) AS volume,
         n2.n_name AS nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region   ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'AMERICA'
    AND p_type = 'PROMO'
    AND o_orderdate >= TIMESTAMP '1995-01-01'
    AND o_orderdate < TIMESTAMP '1997-01-01'
) GROUP BY o_year ORDER BY o_year
""",
    group="TPCH",
)
def q8_national_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 shape (national market share): the deepest join tree in the
    suite — lineitem against five broadcast dims plus the orders fact,
    with nation joined twice under different roles (customer region
    membership vs supplier nationality). All dim filters (r_name,
    p_type) reach their scans before the join; the two fact tables
    shuffle once on their join keys; the share is a conditional
    decimal sum over the already-joined rows (one pass, no second
    scan). TPC-H Q8 with fixture domains: region AMERICA, part type
    PROMO, market-share nation NATION_5, the classic two-year window."""
    li = load_table(spark, sf_dir, "lineitem")
    part = F.broadcast(
        load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    )
    sup = F.broadcast(load_table(spark, sf_dir, "supplier"))
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    cust = load_table(spark, sf_dir, "customer")
    n1 = F.broadcast(
        load_table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
        )
    )
    region = F.broadcast(
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    )
    n2 = F.broadcast(
        load_table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
        )
    )
    vol = _dec_revenue_col()
    zero = F.lit(0).cast("decimal(24,4)")
    joined = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(sup, li.l_suppkey == sup.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(n1, F.col("c_nationkey") == F.col("n1_key"))
        .join(region, F.col("n1_region") == F.col("r_regionkey"))
        .join(n2, F.col("s_nationkey") == F.col("n2_key"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            vol.alias("volume"),
            "nation",
        )
    )
    return (
        joined.groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("nation") == "NATION_5", F.col("volume")).otherwise(zero))
                .cast("double")
                / F.sum("volume").cast("double"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


# ---- derived partsupp (q2/q9/q11/q20) ----------------------------------
# The fixture set ships no partsupp table, so the four partsupp TPC-H
# shapes derive one DETERMINISTICALLY from part x supplier — the same
# integer formulas run in Spark and in the DuckDB oracle, so the gate
# still checks the query plumbing exactly. 4 suppliers per part
# (consecutive residues mod |supplier| -> always distinct), integer
# availqty, and supplycost kept in integer CENTS so every money
# aggregate below is exact and summation-order-independent.

_PARTSUPP_SQL = """
sc AS (SELECT COUNT(*)::BIGINT AS s_n FROM supplier),
js(j) AS (VALUES (0::BIGINT), (1), (2), (3)),
partsupp AS (
  SELECT ps_partkey, ps_suppkey, ps_availqty,
         (ps_partkey * 31 + ps_suppkey * 17) % 99900 + 100 AS ps_supplycost_cents
  FROM (SELECT p_partkey AS ps_partkey,
               ((p_partkey * 4 + j) % s_n) + 1 AS ps_suppkey,
               (p_partkey * 7 + j * 13) % 9998 + 1 AS ps_availqty
        FROM part CROSS JOIN js CROSS JOIN sc))
"""


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    s_n = load_table(spark, sf_dir, "supplier").count()
    js = spark.range(4).select(F.col("id").alias("j"))
    ps0 = (
        part.select("p_partkey")
        .crossJoin(F.broadcast(js))
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            ((F.col("p_partkey") * 4 + F.col("j")) % s_n + 1).alias("ps_suppkey"),
            ((F.col("p_partkey") * 7 + F.col("j") * 13) % 9998 + 1).alias(
                "ps_availqty"
            ),
        )
    )
    return ps0.withColumn(
        "ps_supplycost_cents",
        (F.col("ps_partkey") * 31 + F.col("ps_suppkey") * 17) % 99900 + 100,
    )


@register(
    "q2_min_cost_supplier",
    oracle=f"""
WITH {_PARTSUPP_SQL},
esupp AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'),
cand AS (
  SELECT p_partkey, ps_suppkey, ps_supplycost_cents
  FROM part JOIN partsupp ON p_partkey = ps_partkey
  WHERE p_size BETWEEN 10 AND 20 AND p_type = 'LARGE'),
ec AS (SELECT c.* FROM cand c JOIN esupp e ON c.ps_suppkey = e.s_suppkey),
mn AS (SELECT p_partkey, MIN(ps_supplycost_cents) AS mc FROM ec GROUP BY p_partkey)
SELECT s_acctbal, s_name, n_name, p_partkey,
       CAST(ps_supplycost_cents AS DOUBLE) / 100.0 AS supplycost
FROM ec JOIN mn USING (p_partkey) JOIN esupp ON ps_suppkey = s_suppkey
WHERE ps_supplycost_cents = mc
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
""",
    group="TPCH",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: min-supplycost supplier per part within a
    region — correlated-MIN turned into groupBy + equality join on
    exact integer cents (no double-tie nondeterminism). The region
    dimension chain broadcasts; the only shuffle is the per-part MIN."""
    ps = _partsupp(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_size").between(10, 20) & (F.col("p_type") == "LARGE")
    )
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    esupp = sup.join(
        F.broadcast(nat.join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)),
        sup.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    ec = (
        ps.join(F.broadcast(part.select("p_partkey")), ps.ps_partkey == F.col("p_partkey"))
        .join(F.broadcast(esupp), ps.ps_suppkey == F.col("s_suppkey"))
    )
    mn = ec.groupBy(F.col("p_partkey").alias("mk")).agg(
        F.min("ps_supplycost_cents").alias("mc")
    )
    return (
        ec.join(
            F.broadcast(mn),
            (F.col("p_partkey") == F.col("mk"))
            & (F.col("ps_supplycost_cents") == F.col("mc")),
        )
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            (F.col("ps_supplycost_cents").cast("double") / 100.0).alias("supplycost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q9_product_profit",
    oracle=f"""
WITH {_PARTSUPP_SQL}
SELECT n_name AS nation, EXTRACT(year FROM l_shipdate)::BIGINT AS o_year,
       CAST(ROUND(SUM(rev_u - cost_u) / 10000.0, 2) AS DOUBLE) AS profit
FROM (
  SELECT l.l_suppkey, l.l_shipdate,
         CAST(CAST(l.l_extendedprice AS DECIMAL(18,4))
              * (1 - CAST(l.l_discount AS DECIMAL(6,4))) * 10000 AS BIGINT) AS rev_u,
         ps.ps_supplycost_cents * CAST(l.l_quantity AS BIGINT) * 100 AS cost_u
  FROM lineitem l
  JOIN partsupp ps ON ps.ps_partkey = l.l_partkey AND ps.ps_suppkey = l.l_suppkey
  JOIN part p ON p.p_partkey = l.l_partkey
  WHERE p.p_name LIKE '%gear%') x
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name, EXTRACT(year FROM l_shipdate)
ORDER BY nation, o_year DESC
""",
    group="TPCH",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit (revenue - supply cost) by supplier
    nation and ship year for a part-name family. All money flows in
    integer 1e-4-dollar units (revenue exact via decimal then scaled
    to long; cost exact as cents x integer quantity), so the sum is
    order-independent and the oracle matches bit-for-bit. partsupp
    joins lineitem on BOTH keys — the Q9 join pattern — and the
    nation/part dims broadcast."""
    ps = _partsupp(spark, sf_dir)
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    rev_u = (_dec_revenue_col() * 10000).cast("long")
    joined = (
        li.join(F.broadcast(part.select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .join(
            ps,
            (ps.ps_partkey == li.l_partkey) & (ps.ps_suppkey == li.l_suppkey),
        )
        .select(
            "l_suppkey",
            F.year("l_shipdate").cast("long").alias("o_year"),
            rev_u.alias("rev_u"),
            (
                F.col("ps_supplycost_cents") * F.col("l_quantity").cast("long") * 100
            ).alias("cost_u"),
        )
    )
    return (
        joined.join(F.broadcast(sup.select("s_suppkey", "s_nationkey")), joined.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), "o_year")
        .agg(
            F.round((F.sum(F.col("rev_u") - F.col("cost_u"))) / 10000.0, 2)
            .cast("double")
            .alias("profit")
        )
        .orderBy("nation", F.col("o_year").desc())
    )


@register(
    "q11_important_stock",
    oracle=f"""
WITH {_PARTSUPP_SQL},
natsupp AS (
  SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'),
stock AS (
  SELECT ps_partkey, SUM(ps_supplycost_cents * ps_availqty) AS v
  FROM partsupp JOIN natsupp ON ps_suppkey = s_suppkey
  GROUP BY ps_partkey),
tot AS (SELECT SUM(v) AS t FROM stock)
SELECT ps_partkey, CAST(v AS DOUBLE) / 100.0 AS stock_value
FROM stock, tot
WHERE v * 1000 > t
ORDER BY v DESC, ps_partkey
""",
    group="TPCH",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part stock value for one nation's
    suppliers, kept when above 1/1000 of the nation's total. The
    HAVING-vs-scalar-subquery comparison runs as exact integer
    cents (v * 1000 > total) — no double-threshold edge rows."""
    ps = _partsupp(spark, sf_dir)
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    natsupp = sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey).select(
        "s_suppkey"
    )
    stock = (
        ps.join(F.broadcast(natsupp), ps.ps_suppkey == F.col("s_suppkey"))
        .groupBy("ps_partkey")
        .agg(F.sum(F.col("ps_supplycost_cents") * F.col("ps_availqty")).alias("v"))
    )
    tot = F.broadcast(stock.agg(F.sum("v").alias("t")))
    return (
        stock.crossJoin(tot)
        .filter(F.col("v") * 1000 > F.col("t"))
        .select("ps_partkey", (F.col("v").cast("double") / 100.0).alias("stock_value"))
        .orderBy((F.col("stock_value")).desc(), "ps_partkey")
    )


@register(
    "q20_excess_stock_suppliers",
    oracle=f"""
WITH {_PARTSUPP_SQL},
qty96 AS (
  SELECT l_partkey, l_suppkey, SUM(l_quantity) AS q
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY l_partkey, l_suppkey),
excess AS (
  SELECT DISTINCT ps_suppkey
  FROM partsupp
  JOIN part ON p_partkey = ps_partkey AND p_name LIKE 'small%'
  JOIN qty96 ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
  WHERE ps_availqty > 0.5 * q)
SELECT s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
JOIN excess ON s_suppkey = ps_suppkey
ORDER BY s_name
""",
    group="TPCH",
)
def q20_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers holding excess stock (availqty >
    half the 1996 shipped quantity) of a part-name family. The
    correlated quantity subquery becomes a grouped aggregate joined
    on both keys; the final supplier list is a semi-join (distinct
    suppkeys), so no row duplication reaches the output."""
    ps = _partsupp(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    qty96 = li.groupBy("l_partkey", "l_suppkey").agg(F.sum("l_quantity").alias("q"))
    excess = (
        ps.join(F.broadcast(part.select("p_partkey")), ps.ps_partkey == F.col("p_partkey"))
        .join(
            qty96,
            (F.col("l_partkey") == ps.ps_partkey) & (F.col("l_suppkey") == ps.ps_suppkey),
        )
        .filter(F.col("ps_availqty") > 0.5 * F.col("q"))
        .select("ps_suppkey")
        .distinct()
    )
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    return (
        sup.join(excess, sup.s_suppkey == F.col("ps_suppkey"), "left_semi")
        .join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .select("s_name", "n_name")
        .orderBy("s_name")
    )
