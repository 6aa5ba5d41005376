"""Group C — joins (SURVEY.md §2.2 C).

Scale notes per shape:
- dims (region/nation/supplier) are broadcast — no shuffle of the fact
  side (C2 asserts the plan; Catalyst auto-broadcasts under the 64 MB
  threshold set in session.py, and C2 forces it with F.broadcast).
- big-big equi joins (C13 lineitem self-join) shuffle on the join key;
  AQE handles skew at runtime.
- non-equi residuals (C6/C10/C11) keep an equi key so Spark picks
  sort-merge/shuffle-hash with a residual condition rather than a
  cartesian BNLJ — the only scalable formulation at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fixtures import load_table
from . import register


@register(
    "c1_inner_equi_join",
    oracle="""
SELECT n_name, COUNT(*) AS c
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name
""",
    group="C",
)
def c1_inner_equi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        cust.join(nation, cust.c_nationkey == nation.n_nationkey, "inner")
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("c"))
        # <= |nation| = 25 groups: one-task in-partition sort, no range
        # exchange (the c3/c3e convention, round 15)
        .coalesce(1)
        .sortWithinPartitions("n_name")
    )


@register(
    "c2_broadcast_join",
    oracle="""
SELECT n_name, COUNT(*) AS c
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name
""",
    group="C",
)
def c2_broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1 with an explicit broadcast of the dim side — the fact table
    never shuffles for the join (plan asserted in test_plans)."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey, "inner")
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("c"))
        .coalesce(1)  # <= 25 groups (c3 convention)
        .sortWithinPartitions("n_name")
    )


@register(
    "c3_multiway_join",
    oracle="""
SELECT r_name, n_name, COUNT(*) AS cnt
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY 1, 2 ORDER BY 1, 2
""",
    group="C",
)
def c3_multiway_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    # coalesce(1) + in-partition sort, NOT orderBy (the c3e view-read
    # convention, round 15): groups are bounded by |nation| = 25 at any
    # scale factor, so the global sort's range exchange (a sampling job
    # + a shuffle job per call) buys nothing. Identical total order;
    # 6 jobs -> 4 (sf0.1 med 0.325 -> 0.209 s).
    return (
        cust.join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .coalesce(1)
        .sortWithinPartitions("r_name", "n_name")
    )


@register(
    "c4_left_outer_join",
    oracle="""
SELECT c_custkey, COUNT(o_orderkey) AS cnt
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey ORDER BY c_custkey
LIMIT 200
""",
    group="C",
)
def c4_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("cnt"))
        .orderBy("c_custkey")
        .limit(200)
    )


@register(
    "c5_right_outer_join",
    oracle="""
SELECT c_custkey, COUNT(o_orderkey) AS cnt
FROM orders RIGHT JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey ORDER BY c_custkey
LIMIT 200
""",
    group="C",
)
def c5_right_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey, "right")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("cnt"))
        .orderBy("c_custkey")
        .limit(200)
    )


@register(
    "c6_full_outer_join",
    oracle="""
SELECT COUNT(*) AS cnt
FROM supplier FULL JOIN customer
  ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal
""",
    group="C",
)
def c6_full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    cond = (sup.s_nationkey == cust.c_nationkey) & (sup.s_acctbal > cust.c_acctbal)
    return sup.join(cust, cond, "full").agg(F.count(F.lit(1)).alias("cnt"))


@register(
    "c7_left_semi_join",
    oracle="""
SELECT COUNT(*) AS cnt FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""",
    group="C",
)
def c7_left_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_semi").agg(
        F.count(F.lit(1)).alias("cnt")
    )


@register(
    "c8_left_anti_join",
    oracle="""
SELECT COUNT(*) AS cnt FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""",
    group="C",
)
def c8_left_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").agg(
        F.count(F.lit(1)).alias("cnt")
    )


@register(
    "c9_cross_join",
    oracle="SELECT COUNT(*) AS cnt FROM region CROSS JOIN nation",
    group="C",
)
def c9_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    return region.crossJoin(nation).agg(F.count(F.lit(1)).alias("cnt"))


@register(
    "c10_theta_join",
    oracle="""
SELECT COUNT(*) AS cnt
FROM supplier s JOIN customer c
  ON s.s_nationkey = c.c_nationkey AND c.c_acctbal > s.s_acctbal
""",
    group="C",
)
def c10_theta_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    sup = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    cond = (sup.s_nationkey == cust.c_nationkey) & (cust.c_acctbal > sup.s_acctbal)
    return sup.join(cust, cond).agg(F.count(F.lit(1)).alias("cnt"))


@register(
    "c11_time_range_join",
    oracle="""
SELECT COUNT(*) AS cnt
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND b.ts > a.ts
 AND b.ts <= a.ts + INTERVAL 1 HOUR
 AND a.event_id <> b.event_id
""",
    group="C",
)
def c11_time_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self range-join on time: equi on user_id keeps it a shuffle join
    with a range residual (never a cartesian product)."""
    ev = load_table(spark, sf_dir, "events")
    a = ev.alias("a")
    b = ev.alias("b")
    cond = (
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("b.ts") > F.col("a.ts"))
        & (F.col("b.ts") <= F.col("a.ts") + F.expr("INTERVAL 1 HOUR"))
        & (F.col("a.event_id") != F.col("b.event_id"))
    )
    return a.join(b, cond).agg(F.count(F.lit(1)).alias("cnt"))


@register(
    "c12_asof_join",
    oracle="""
SELECT o_orderkey, epoch_us(MAX(ts)) AS asof_us
FROM orders JOIN events
  ON user_id = o_custkey % 50 AND ts <= o_orderdate
GROUP BY o_orderkey
ORDER BY o_orderkey
LIMIT 1000
""",
    group="C",
)
def c12_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: latest event at-or-before each order date for the
    order's (derived) user. Expressed as equi-join + max-aggregate —
    exact in both engines; the dedicated merge-asof operator lives in
    operators/asof.py for the scale path."""
    orders = load_table(spark, sf_dir, "orders")
    ev = load_table(spark, sf_dir, "events")
    cond = (ev.user_id == orders.o_custkey % 50) & (ev.ts <= orders.o_orderdate)
    return (
        orders.join(ev, cond)
        .groupBy("o_orderkey")
        .agg(F.unix_micros(F.max("ts")).alias("asof_us"))
        .orderBy("o_orderkey")
        .limit(1000)
    )


@register(
    "c13_self_join",
    oracle="""
SELECT COUNT(*) AS cnt
FROM lineitem a JOIN lineitem b
  ON a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber
""",
    group="C",
)
def c13_self_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    a = li.alias("a")
    b = li.alias("b")
    cond = (F.col("a.l_orderkey") == F.col("b.l_orderkey")) & (
        F.col("a.l_linenumber") < F.col("b.l_linenumber")
    )
    return a.join(b, cond).agg(F.count(F.lit(1)).alias("cnt"))


@register(
    "c12b_asof_join_operator",
    oracle="""
SELECT o_orderkey, epoch_us(MAX(ts)) AS asof_us
FROM orders JOIN events
  ON user_id = o_custkey % 50 AND ts <= o_orderdate
GROUP BY o_orderkey
ORDER BY o_orderkey
LIMIT 1000
""",
    group="C",
)
def c12b_asof_join_operator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedicated merge-asof operator (operators/asof.py: union +
    keyed window, one shuffle, no pair explosion) — must produce the
    same answer as c12's join+max formulation, which is the oracle."""
    from ..operators.asof import asof_join

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_custkey") % 50).alias("uid"),
        F.col("o_orderdate").cast("timestamp").alias("odate"),
    )
    ev = load_table(spark, sf_dir, "events").select(
        F.col("user_id").alias("uid"), "ts"
    )
    joined = asof_join(orders, ev, key="uid", left_ts="odate", right_ts="ts", payload=["ts"])
    return (
        joined.filter(F.col("ts_asof").isNotNull())
        .select("o_orderkey", F.unix_micros("ts_asof").alias("asof_us"))
        .orderBy("o_orderkey")
        .limit(1000)
    )


@register(
    "c14_salted_skew_join",
    oracle="""
SELECT o.o_custkey AS custkey,
       COUNT(*)::BIGINT AS n_orders,
       CAST(ROUND(SUM(o.o_totalprice), 2) AS DOUBLE) AS total_spend
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY o.o_custkey
ORDER BY n_orders DESC, custkey
LIMIT 50
""",
    group="C",
)
def c14_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join for hot keys (operators/skew.py): the big side
    takes a deterministic salt in [0, S), the replicated side explodes
    S-fold, and the join runs on (key, salt) — one hot key's rows
    spread over S tasks instead of melting one reducer. Exact: every
    (row, match) pair exists exactly once. This is the fallback for
    skew AQE can't fix (broadcast-ineligible replicated side, or
    hot-key aggregations); the oracle is the plain join."""
    from ..operators.skew import salted_join

    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    joined = salted_join(
        orders, cust.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey", salts=8
    )
    return (
        joined.groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).cast("double").alias("total_spend"),
        )
        .orderBy(F.col("n_orders").desc(), "custkey")
        .limit(50)
    )


@register(
    "c15_banded_interval_join",
    oracle="""
SELECT COUNT(*) AS cnt
FROM events a JOIN events b
  ON a.event_id < b.event_id
 AND b.ts BETWEEN a.ts - INTERVAL 60 SECOND AND a.ts + INTERVAL 60 SECOND
""",
    group="C",
)
def c15_banded_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band (interval) join with NO equi key: all event pairs within
    60 s of each other. The naive plan is a nested-loop/cartesian —
    O(n²) and a non-starter at scale. The scale form bucketizes time
    at the band width and equi-joins on the bucket: the left side
    explodes into its bucket ±1 (3 rows), the right side keeps its
    single bucket, so every qualifying pair meets in EXACTLY one
    bucket (no post-join dedup needed) and the join is a plain
    shuffle-hash on the bucket key. Residual |Δt| ≤ 60 s filters the
    band precisely. Shuffle volume is 3×|left| + |right|; the n²
    explosion is gone. Plan-gated: no CartesianProduct /
    BroadcastNestedLoopJoin."""
    BAND_S = 60
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts")
    bucket = (F.unix_micros("ts") / (BAND_S * 1_000_000)).cast("long")
    a = (
        ev.withColumn(
            "bk", F.explode(F.array(bucket - 1, bucket, bucket + 1))
        )
        .select(F.col("event_id").alias("id_a"), F.col("ts").alias("ts_a"), "bk")
    )
    b = ev.select(
        F.col("event_id").alias("id_b"),
        F.col("ts").alias("ts_b"),
        bucket.alias("bk"),
    )
    pairs = a.join(b, "bk").filter(
        (F.col("id_a") < F.col("id_b"))
        & (
            F.abs(F.unix_micros("ts_b") - F.unix_micros("ts_a"))
            <= BAND_S * 1_000_000
        )
    )
    return pairs.agg(F.count(F.lit(1)).alias("cnt"))
