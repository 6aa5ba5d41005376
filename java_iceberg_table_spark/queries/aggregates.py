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
       ROUND(SUM(l_quantity), 4) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
                * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
       ROUND(AVG(l_quantity), 4) AS avg_qty,
       ROUND(AVG(l_extendedprice), 4) AS avg_price,
       ROUND(AVG(l_discount), 4) AS avg_disc,
       COUNT(*) AS count_order
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

    Money math runs in EXACT fixed-point over int64: TPC-H money
    columns carry exactly 2 decimals (DECIMAL(15,2) in the spec;
    verified against the fixtures), so cents are integers, the
    per-row products are integers at scale 1e4/1e6, and the sums are
    exact longs summed in whole-stage codegen — the same scaled-
    integer representation a vectorized decimal engine uses
    internally, with none of Spark's >18-precision BigDecimal slow
    path (measured 1.9x on this query). The final divisions by a
    power of ten produce the identical IEEE double as the oracle's
    exact-decimal-sum-to-double cast while every scaled sum stays
    under 2^53 (holds through ~sf50 for sum_charge; a larger table
    wants the decimal form). Averages stay double (division yields
    non-terminating decimals; boundary collisions are improbable).
    """
    li = load_table(spark, sf_dir, "lineitem")
    # (x + 0.5)::long is round-half-up for the NON-NEGATIVE money
    # columns (TPC-H money >= 0) without F.round's per-row BigDecimal
    # allocation on doubles (measured 25% of d1's runtime).
    # Expressions are built as parsed SQL strings (round 14): the same
    # tree via py4j Column ops cost ~0.12 s of driver-side
    # construction PER CALL — ~40% of this query's steady-state bench
    # time — while the parser builds it in microseconds. Identical
    # operations, identical plan (optimized-plan diff checked when the
    # change landed), identical values.
    price_c = "CAST(l_extendedprice * 100 + 0.5D AS BIGINT)"  # cents
    disc_c = "CAST(l_discount * 100 + 0.5D AS BIGINT)"
    tax_c = "CAST(l_tax * 100 + 0.5D AS BIGINT)"
    disc_price_4 = f"({price_c} * (100 - {disc_c}))"  # scale 1e4
    charge_6 = f"({disc_price_4} * (100 + {tax_c}))"  # scale 1e6
    measures = [
        f"round(sum(l_quantity), {R}) AS sum_qty",
        f"sum({price_c}) / 100.0D AS sum_base_price",
        f"sum({disc_price_4}) / 10000.0D AS sum_disc_price",
        f"sum({charge_6}) / 1000000.0D AS sum_charge",
        f"round(avg(l_quantity), {R}) AS avg_qty",
        f"round(avg(l_extendedprice), {R}) AS avg_price",
        f"round(avg(l_discount), {R}) AS avg_disc",
        "count(1) AS count_order",
    ]
    # coalesce(1) + in-partition sort, NOT orderBy (the c3e view-read
    # convention, round 15): the group count is structurally <= 6
    # (returnflag x linestatus are one-char flags), so a global sort's
    # range exchange — a sampling job plus a shuffle job per call — buys
    # nothing. One task merges and sorts the <= 6 final rows; identical
    # total order, 4 jobs -> 2 (sf0.1 med 0.302 -> 0.224 s).
    return (
        li.filter("l_shipdate <= DATE'1998-09-02'")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(*[F.expr(m) for m in measures])
        .coalesce(1)
        .sortWithinPartitions("l_returnflag", "l_linestatus")
    )


@register(
    "d1p_prepared_tpch_q1",
    oracle="""
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 4) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
                * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
       ROUND(AVG(l_quantity), 4) AS avg_qty,
       ROUND(AVG(l_extendedprice), 4) AS avg_price,
       ROUND(AVG(l_discount), 4) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
    group="D",
)
def d1p_prepared_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 under the PREPARED protocol (round 10, VERDICT r9
    item 3): byte-identical query to d1 over the SAME raw fixture
    parquet — no engine-storage help — with the constructed DataFrame
    cached per (session, sf_dir) through ``queries/prepared.py``.

    PROTOCOL, stated loudly (revised same-round after finding the
    map-output-reuse pitfall — queries/prepared.py has the full
    story): the first call builds the statement and pays py4j
    construction + Catalyst analysis once; a prepared statement then
    re-pays ONLY stage execution per run. Spark grants repeated
    actions on the same Dataset one extra gift — reuse of the
    completed map stage's registered outputs — which reads NO data
    and must not be timed as a read, so the bench times this row
    under the pooled fresh-stage protocol (bench.py
    time_prepared_pool). Honest tiers at sf0.1, quiet box: fresh
    construction 0.349 s (4.3x DuckDB 0.081), prepared fresh-stage
    re-execution 0.201 s (2.5x), map-output-reuse tail 0.051 s. The
    prepared tier is the like-for-like against a warm DuckDB
    connection re-running the SQL; d1 stays registered
    construction-per-call so both protocols are visible side by
    side. Same full Q1 oracle as d1."""
    from .prepared import prepared_plan

    return prepared_plan(
        spark, sf_dir, "d1p_prepared_tpch_q1",
        lambda: d1_tpch_q1(spark, sf_dir),
    )


@register(
    "d2_global_aggregate",
    oracle="""
SELECT COUNT(*) AS cnt,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 4) AS DOUBLE) AS sum_price,
       ROUND(MIN(o_totalprice), 4) AS min_price,
       ROUND(MAX(o_totalprice), 4) AS max_price
FROM orders
""",
    group="D",
)
def d2_global_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.count(F.lit(1)).alias("cnt"),
        F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")), R)
        .cast("double")
        .alias("sum_price"),
        F.round(F.min("o_totalprice"), R).alias("min_price"),
        F.round(F.max("o_totalprice"), R).alias("max_price"),
    )


@register(
    "d3_count_distinct",
    oracle="SELECT COUNT(DISTINCT o_custkey) AS cnt FROM orders",
    group="D",
)
def d3_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(F.countDistinct("o_custkey").alias("cnt"))


@register(
    "d4_multi_distinct",
    oracle="""
SELECT COUNT(DISTINCT l_partkey) AS cnt_part,
       COUNT(DISTINCT l_suppkey) AS cnt_supp
FROM lineitem
""",
    group="D",
)
def d4_multi_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two distinct aggregates in one pass — Catalyst plans the Expand
    strategy (one shuffle, not two scans)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_partkey").alias("cnt_part"),
        F.countDistinct("l_suppkey").alias("cnt_supp"),
    )


@register(
    "d5_having",
    oracle="""
SELECT o_custkey, COUNT(*) AS c FROM orders
GROUP BY o_custkey HAVING COUNT(*) > 10
ORDER BY o_custkey
""",
    group="D",
)
def d5_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") > 10)
        .orderBy("o_custkey")
    )


@register(
    "d6_rollup",
    oracle="""
SELECT r_name, n_name, COUNT(*) AS cnt
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP(r_name, n_name)
ORDER BY 1 NULLS FIRST, 2 NULLS FIRST
""",
    group="D",
)
def d6_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("cnt"))
        # rollup of 5 regions x 25 nations: <= 31 rows — one-task
        # in-partition sort, no range exchange (c3 convention, round 15)
        .coalesce(1)
        .sortWithinPartitions(
            F.col("r_name").asc_nulls_first(), F.col("n_name").asc_nulls_first()
        )
    )


@register(
    "d7_cube",
    oracle="""
SELECT r_name, n_name, COUNT(*) AS cnt
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY CUBE(r_name, n_name)
ORDER BY 1 NULLS FIRST, 2 NULLS FIRST
""",
    group="D",
)
def d7_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        nation.join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .cube("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .coalesce(1)  # cube <= 36 rows (c3 convention)
        .sortWithinPartitions(
            F.col("r_name").asc_nulls_first(), F.col("n_name").asc_nulls_first()
        )
    )


@register(
    "d8_grouping_sets",
    oracle="""
SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
ORDER BY 1 NULLS FIRST, 2 NULLS FIRST
""",
    group="D",
)
def d8_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("_gs_lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, COUNT(*) AS cnt
        FROM _gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        ORDER BY 1 NULLS FIRST, 2 NULLS FIRST
        """
    )


@register(
    "d9_approx_distinct",
    oracle="SELECT COUNT(DISTINCT o_custkey) AS cnt_exact, TRUE AS within_tol FROM orders",
    group="D",
)
def d9_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct; self-checking formulation — the query
    outputs whether the sketch lands within 5% of exact, so the oracle
    hash-match stays well-defined (SURVEY §2.2 D9 tolerance design)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.countDistinct("o_custkey").alias("cnt_exact"),
        (
            F.abs(F.approx_count_distinct("o_custkey", rsd=0.01) - F.countDistinct("o_custkey"))
            <= 0.05 * F.countDistinct("o_custkey")
        ).alias("within_tol"),
    )


@register(
    "d10_percentiles",
    oracle="""
SELECT ROUND(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
       ROUND(quantile_cont(l_quantity, 0.9), 4) AS p90_qty
FROM lineitem
""",
    group="D",
)
def d10_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.percentile("l_quantity", F.lit(0.5)), R).alias("median_qty"),
        F.round(F.percentile("l_quantity", F.lit(0.9)), R).alias("p90_qty"),
    )


@register(
    "d11_stddev_var",
    oracle="""
SELECT ROUND(STDDEV_SAMP(o_totalprice), 2) AS sd,
       ROUND(VAR_SAMP(o_totalprice), 2) AS var
FROM orders
""",
    group="D",
)
def d11_stddev_var(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.agg(
        F.round(F.stddev_samp("o_totalprice"), 2).alias("sd"),
        F.round(F.var_samp("o_totalprice"), 2).alias("var"),
    )


@register(
    "d12_collect_list",
    oracle="""
SELECT n_regionkey, array_to_string(list_sort(array_agg(n_name)), ',') AS names
FROM nation GROUP BY n_regionkey ORDER BY n_regionkey
""",
    group="D",
)
def d12_collect_list(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list is order-nondeterministic under parallelism —
    canonicalized by array_sort + join so the result is stable."""
    nation = load_table(spark, sf_dir, "nation")
    return (
        nation.groupBy("n_regionkey")
        .agg(F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("names"))
        .orderBy("n_regionkey")
    )


@register(
    "d10b_grouped_percentiles",
    oracle="""
SELECT l_returnflag,
       ROUND(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
       ROUND(quantile_cont(l_extendedprice, 0.95), 4) AS p95_price
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
    group="D",
)
def d10b_grouped_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.percentile("l_quantity", F.lit(0.5)), R).alias("median_qty"),
            F.round(F.percentile("l_extendedprice", F.lit(0.95)), R).alias("p95_price"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "d13_corr_covar",
    oracle="""
SELECT ROUND(CORR(l_quantity, l_extendedprice), 4) AS corr_qp,
       ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 2) AS covar_qp,
       ROUND(REGR_SLOPE(l_extendedprice, l_quantity), 2) AS slope
FROM lineitem
""",
    group="D",
)
def d13_corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), R).alias("corr_qp"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias("covar_qp"),
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 2).alias("slope"),
    )


@register(
    "d14_pivot",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
       CAST(SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
""",
    group="D",
)
def d14_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: one hash aggregate with per-pivot-value conditional
    measures (what Spark compiles groupBy().pivot() into when values
    are given explicitly — giving them avoids the extra distinct-values
    job AND makes the output schema static, both required at scale)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.count(F.lit(1)))
        .na.fill(0)
        .orderBy("l_returnflag")
    )


@register(
    "d15_unpivot",
    oracle="""
SELECT o_orderkey, m, v FROM (
  SELECT o_orderkey, 'totalprice' AS m, o_totalprice AS v FROM orders
  UNION ALL
  SELECT o_orderkey, 'custkey' AS m, CAST(o_custkey AS DOUBLE) AS v FROM orders
) ORDER BY o_orderkey, m LIMIT 300
""",
    group="D",
)
def d15_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt: wide->long without a shuffle (narrow expand of
    each row into one row per measure; the UNION ALL formulation would
    scan the table once per measure — melt scans once)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderkey", F.col("o_totalprice"), F.col("o_custkey").cast("double")
        )
        .melt(
            ids=["o_orderkey"],
            values=["o_totalprice", "o_custkey"],
            variableColumnName="m",
            valueColumnName="v",
        )
        .withColumn("m", F.regexp_replace("m", "^o_", ""))
        .orderBy("o_orderkey", "m")
        .limit(300)
    )


@register(
    "d16_cohort_retention",
    oracle="""
WITH s AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cw
  FROM events WHERE event_type = 'signup' GROUP BY user_id
),
a AS (
  SELECT DISTINCT e.user_id, s.cw,
         datediff('day', s.cw, date_trunc('week', e.ts)) // 7 AS week_offset
  FROM events e JOIN s USING (user_id)
  WHERE e.ts >= s.cw
)
SELECT strftime(cw, '%Y-%m-%d') AS cohort_week, week_offset, COUNT(*) AS n_users
FROM a GROUP BY 1, 2 ORDER BY 1, 2
""",
    group="D",
)
def d16_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: users grouped by signup week, counted
    once per later active week. The product-analytics staple; shape is
    one small per-user reduction (first signup) broadcast back against
    the event stream — the events side shuffles once for the DISTINCT,
    aggregations are combinable."""
    ev = load_table(spark, sf_dir, "events")
    signup = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).alias("cw"))
    )
    active = (
        ev.join(F.broadcast(signup), "user_id")
        .filter(F.col("ts") >= F.col("cw"))
        .select(
            "user_id",
            "cw",
            (
                F.datediff(F.date_trunc("week", F.col("ts")), F.col("cw")) / 7
            )
            .cast("long")
            .alias("week_offset"),
        )
        .distinct()
    )
    return (
        active.groupBy(F.date_format("cw", "yyyy-MM-dd").alias("cohort_week"), "week_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_week", "week_offset")
    )


@register(
    "d17_funnel_analysis",
    oracle="""
WITH v AS (
  SELECT user_id, MIN(ts) AS t FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(e.ts) AS t
  FROM events e JOIN v ON v.user_id = e.user_id AND e.ts > v.t
  WHERE e.event_type = 'click' GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS t
  FROM events e JOIN c ON c.user_id = e.user_id AND e.ts > c.t
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT (SELECT COUNT(*) FROM v) AS n_view,
       (SELECT COUNT(*) FROM c) AS n_view_click,
       (SELECT COUNT(*) FROM p) AS n_view_click_purchase
""",
    group="D",
)
def d17_funnel_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users whose first view precedes a click that
    precedes a purchase (strict event-time ordering, first-touch per
    stage). Each stage is one combinable per-user MIN + a broadcast
    join of the previous stage's user set — per-user state, never a
    per-event self-join."""
    ev = load_table(spark, sf_dir, "events")

    def stage(event_type: str, prev: DataFrame | None) -> DataFrame:
        e = ev.filter(F.col("event_type") == event_type)
        if prev is not None:
            e = e.join(F.broadcast(prev), "user_id").filter(
                F.col("ts") > F.col("t")
            ).drop("t")
        return e.groupBy("user_id").agg(F.min("ts").alias("t"))

    v = stage("view", None)
    c = stage("click", v)
    p = stage("purchase", c)
    counts = [df.agg(F.count(F.lit(1)).alias(name)) for df, name in [
        (v, "n_view"), (c, "n_view_click"), (p, "n_view_click_purchase")
    ]]
    out = counts[0].join(F.broadcast(counts[1])).join(F.broadcast(counts[2]))
    return out
