"""Group E — window functions (SURVEY.md §2.2 E).

Scale notes: every window here partitions by a key (customer, user,
order) so the sort is per-partition after a hash shuffle — no global
sort. E6's running total orders by date globally but runs on a
pre-aggregated daily table (one row per day), so the single-partition
window is tiny by construction.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..fixtures import load_table
from . import register


def _input_bytes(sf_dir: str, name: str) -> int:
    """Driver-side on-disk size of one fixture table (file or dir) —
    the cheap scale proxy for plan decisions (guide §2: derive
    scale-dependent choices from input size, not a constant)."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if os.path.isfile(path):
        return os.path.getsize(path)
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


# Above this input size e1 pays one tiny threshold job to pre-filter
# the window shuffle (below, the extra job costs more than it saves —
# sf0.1 keeps its byte-identical single-window plan). A/B'd: sf0.1
# (2.7 MB) flat with the gate off, sf1 (18 MB) 0.72->0.51 s and sf10
# (176 MB) 1.48->0.93 s with it on, so 16 MB sits under the measured
# break-even. Parameterized so a cluster deployment can re-tune
# without touching code.
_TOPK_PREFILTER_BYTES = int(
    float(os.environ.get("SPARK_GRAFT_TOPK_PREFILTER_MB", "16")) * 1024 * 1024
)


@register(
    "e1_row_number_topk",
    oracle="""
SELECT o_custkey, o_orderkey, rn FROM (
  SELECT o_custkey, o_orderkey,
         ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders
) WHERE rn <= 3
ORDER BY o_custkey, rn
LIMIT 500
""",
    group="E",
)
def e1_row_number_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer first-3-orders, 500 smallest (custkey, rn) rows.

    At scale the dominant cost is shuffling EVERY order into the
    per-custkey window although only custkeys <= the 500th-smallest
    distinct custkey can reach the final ``ORDER BY o_custkey, rn
    LIMIT 500`` (each custkey contributes >= 1 row). Above
    ``_TOPK_PREFILTER_BYTES`` we pre-pay one tiny job for a SAFE upper
    bound on that threshold — the 500th-smallest distinct custkey of
    any 100k-row subset is >= the global one (a subset has no extra
    small values) — and push ``o_custkey <= t`` into the parquet scan
    (row-group pruning) before the exact window runs unchanged on the
    survivors. Keeps NULL custkeys; skips the filter when the subset
    holds < 500 distinct keys. Below the gate the plan is the original
    single-window shape, byte-identical. Values proven identical at
    sf0.001/sf0.1/sf10 (test_e1_prefilter_equivalence)."""
    orders = load_table(spark, sf_dir, "orders")
    pruned = orders
    if _input_bytes(sf_dir, "orders") >= _TOPK_PREFILTER_BYTES:
        r = (
            orders.select("o_custkey")
            .limit(100_000)
            .distinct()
            .orderBy("o_custkey")
            .limit(500)
            .agg(F.count(F.lit(1)).alias("n"), F.max("o_custkey").alias("t"))
        ).collect()[0]
        if r["n"] == 500:
            pruned = orders.filter(
                (F.col("o_custkey") <= F.lit(r["t"]))
                | F.col("o_custkey").isNull()
            )
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        pruned.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", F.col("rn").cast("long").alias("rn"))
        .orderBy("o_custkey", "rn")
        .limit(500)
    )


@register(
    "e2_rank_dense_rank",
    oracle="""
SELECT c_nationkey, c_custkey, rnk, drnk FROM (
  SELECT c_nationkey, c_custkey,
         RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS rnk,
         DENSE_RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC) AS drnk
  FROM customer
) WHERE rnk <= 5
ORDER BY c_nationkey, rnk, c_custkey
LIMIT 500
""",
    group="E",
)
def e2_rank_dense_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc())
    return (
        cust.withColumn("rnk", F.rank().over(w))
        .withColumn("drnk", F.dense_rank().over(w))
        .filter(F.col("rnk") <= 5)
        .select(
            "c_nationkey",
            "c_custkey",
            F.col("rnk").cast("long").alias("rnk"),
            F.col("drnk").cast("long").alias("drnk"),
        )
        .orderBy("c_nationkey", "rnk", "c_custkey")
        .limit(500)
    )


@register(
    "e3_lag_gap_count",
    oracle="""
SELECT COUNT(*) AS cnt FROM (
  SELECT epoch_us(ts) AS us,
         LAG(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
  FROM events
) WHERE prev_us IS NOT NULL AND us - prev_us > 3600000000
""",
    group="E",
)
def e3_lag_gap_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session-gap detection via lag — the batch analogue of
    the streaming session window (I5). Gap compared in µs in both
    engines to avoid sub-second truncation divergence."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("prev_us", F.lag(F.unix_micros("ts")).over(w))
        .filter(
            F.col("prev_us").isNotNull()
            & (F.unix_micros("ts") - F.col("prev_us") > 3_600_000_000)
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


@register(
    "e4_running_sum",
    oracle="""
SELECT event_id,
       ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS run_sum
FROM events
ORDER BY event_id
LIMIT 1000
""",
    group="E",
)
def e4_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        ev.withColumn("run_sum", F.round(F.sum("value").over(w), 4))
        .select("event_id", "run_sum")
        .orderBy("event_id")
        .limit(1000)
    )


@register(
    "e5_sliding_avg",
    oracle="""
SELECT l_orderkey, l_linenumber,
       ROUND(AVG(l_extendedprice) OVER (PARTITION BY l_orderkey
                 ORDER BY l_linenumber, l_extendedprice, l_partkey, l_suppkey
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mov_avg
FROM lineitem
ORDER BY l_orderkey, l_linenumber, l_extendedprice, l_partkey, l_suppkey
LIMIT 1000
""",
    group="E",
)
def e5_sliding_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(l_orderkey, l_linenumber) is NOT unique in the fixture — the
    window order tie-breaks on (extendedprice, partkey, suppkey), the
    minimal key set verified unique, so the ROWS frame is deterministic
    in both engines."""
    li = load_table(spark, sf_dir, "lineitem")
    order_keys = ["l_linenumber", "l_extendedprice", "l_partkey", "l_suppkey"]
    w = Window.partitionBy("l_orderkey").orderBy(*order_keys).rowsBetween(-2, 0)
    return (
        li.withColumn("mov_avg", F.round(F.avg("l_extendedprice").over(w), 4))
        .orderBy("l_orderkey", *order_keys)
        .select("l_orderkey", "l_linenumber", "mov_avg")
        .limit(1000)
    )


@register(
    "e6_range_frame",
    oracle="""
WITH daily AS (
  SELECT o_orderdate::DATE AS d,
         CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 4) AS DOUBLE) AS day_total
  FROM orders GROUP BY 1
)
SELECT strftime(d, '%Y-%m-%d') AS d,
       ROUND(SUM(day_total) OVER (ORDER BY d
                                  RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW), 4) AS wk_sum
FROM daily
ORDER BY d
LIMIT 400
""",
    group="E",
)
def e6_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range frame over a pre-aggregated daily series. The daily
    pre-aggregation keeps the unpartitioned window bounded (one row per
    day) — the scalable formulation of a global running window."""
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,4)")), 4)
            .cast("double")
            .alias("day_total")
        )
    )
    daily.createOrReplaceTempView("_e6_daily")
    return spark.sql(
        """
        SELECT date_format(d, 'yyyy-MM-dd') AS d,
               ROUND(SUM(day_total) OVER (ORDER BY d
                      RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW), 4) AS wk_sum
        FROM _e6_daily
        ORDER BY d
        LIMIT 400
        """
    )


@register(
    "e7_ntile",
    oracle="""
SELECT q, COUNT(*) AS cnt, ROUND(MIN(o_totalprice), 4) AS min_price
FROM (SELECT o_totalprice, NTILE(4) OVER (ORDER BY o_totalprice, o_orderkey) AS q FROM orders)
GROUP BY q ORDER BY q
""",
    group="E",
)
def e7_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        orders.withColumn("q", F.ntile(4).over(w).cast("long"))
        .groupBy("q")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.min("o_totalprice"), 4).alias("min_price"),
        )
        .orderBy("q")
    )


@register(
    "e8_first_last_value",
    oracle="""
SELECT DISTINCT user_id,
       FIRST_VALUE(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_type,
       LAST_VALUE(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_type
FROM events
ORDER BY user_id
""",
    group="E",
)
def e8_first_last_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        ev.withColumn("first_type", F.first("event_type").over(w))
        .withColumn("last_type", F.last("event_type").over(w))
        .select("user_id", "first_type", "last_type")
        .distinct()
        .orderBy("user_id")
    )


@register(
    "e10_event_transitions",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS prev_type
  FROM events
)
SELECT prev_type, event_type AS next_type, COUNT(*) AS cnt
FROM seq WHERE prev_type IS NOT NULL
GROUP BY prev_type, next_type
ORDER BY cnt DESC, prev_type, next_type
LIMIT 10
""",
    group="E",
)
def e10_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top event-type transitions (first-order Markov counts): lag()
    per user's time-ordered stream, then a combinable pair count. The
    behavioral-analytics building block (what follows what); one
    shuffle on user_id for the window, one tiny agg on the 25 possible
    type pairs — never a self-join on events."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.withColumn("prev_type", F.lag("event_type").over(w))
    return (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), "prev_type", "next_type")
        .limit(10)
    )


@register(
    "e9_percent_rank_cume_dist",
    oracle="""
SELECT c_custkey,
       ROUND(PERCENT_RANK() OVER w, 6) AS pr,
       ROUND(CUME_DIST() OVER w, 6) AS cd
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
ORDER BY c_custkey LIMIT 300
""",
    group="E",
)
def e9_percent_rank_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-position window functions: percent_rank (rank-1)/(n-1)
    and cume_dist over account balance within nation — identical ANSI
    semantics in both engines; the deterministic tie-break on
    c_custkey makes the values hash-stable. Same single-shuffle window
    shape as E1/E2."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return (
        cust.select(
            "c_custkey",
            F.round(F.percent_rank().over(w), 6).alias("pr"),
            F.round(F.cume_dist().over(w), 6).alias("cd"),
        )
        .orderBy("c_custkey")
        .limit(300)
    )


@register(
    "e10_time_bucket_gapfill",
    oracle="""
WITH base AS (
  SELECT event_type AS series, CAST(ts AS DATE) AS bucket_ts,
         epoch_us(ts) AS tus, value AS v
  FROM events
),
obs AS (
  SELECT series, bucket_ts, COUNT(*) AS n_events, AVG(v) AS avg_value,
         (min(struct_pack(t := tus, v := v))).v AS first_value,
         (max(struct_pack(t := tus, v := v))).v AS last_value
  FROM base GROUP BY 1, 2
),
span AS (SELECT MIN(bucket_ts) AS lo, MAX(bucket_ts) AS hi FROM base),
spine AS (
  SELECT s.series, CAST(d.d AS DATE) AS bucket_ts
  FROM (SELECT DISTINCT series FROM base) s,
       (SELECT UNNEST(generate_series(
          (SELECT lo FROM span), (SELECT hi FROM span), INTERVAL 1 DAY)) AS d) d
),
g AS (
  SELECT spine.series, spine.bucket_ts, obs.n_events, obs.avg_value,
         obs.first_value, obs.last_value
  FROM spine LEFT JOIN obs USING (series, bucket_ts)
),
f AS (
  SELECT series, bucket_ts,
         COALESCE(n_events, 0) AS n_events,
         avg_value, first_value, last_value,
         LAST_VALUE(avg_value IGNORE NULLS) OVER wb AS prev_v,
         LAST_VALUE(CASE WHEN avg_value IS NOT NULL THEN bucket_ts END
                    IGNORE NULLS) OVER wb AS prev_d,
         FIRST_VALUE(avg_value IGNORE NULLS) OVER wf AS next_v,
         FIRST_VALUE(CASE WHEN avg_value IS NOT NULL THEN bucket_ts END
                     IGNORE NULLS) OVER wf AS next_d
  FROM g
  WINDOW wb AS (PARTITION BY series ORDER BY bucket_ts
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wf AS (PARTITION BY series ORDER BY bucket_ts
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT series, strftime(bucket_ts, '%Y-%m-%d') AS bucket_day, n_events,
       ROUND(avg_value, 4) AS avg_value,
       ROUND(first_value, 4) AS first_value,
       ROUND(last_value, 4) AS last_value,
       ROUND(prev_v, 4) AS locf_value,
       ROUND(CASE WHEN avg_value IS NOT NULL THEN avg_value
                  WHEN prev_v IS NULL THEN next_v
                  WHEN next_v IS NULL THEN prev_v
                  ELSE prev_v + (next_v - prev_v)
                       * (date_diff('day', prev_d, bucket_ts)::DOUBLE
                          / date_diff('day', prev_d, next_d)) END, 4)
         AS lin_value
FROM f ORDER BY series, bucket_ts
""",
    group="E",
)
def e10_time_bucket_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucket gap filling with LOCF and linear interpolation
    (round 8) — the hypertable-rollup family op
    (TimescaleDB time_bucket_gapfill/locf/interpolate) the event-
    stream domain expects: per event_type, a DENSE daily spine over
    the data's span with the observed per-day average, the bucket's
    FIRST and LAST observation (round 10 — TimescaleDB's first()/
    last() rollup aggregates, tie-broken by value so both engines
    agree on timestamp collisions), the last observation carried
    forward, and the linear interpolation between neighboring
    observed days. Spark shape (operators/timeseries.py):
    one (series, day) hash aggregate with map-side partials, a
    sequence()-generated spine (never a scan), and two windows
    partitioned by series — each series fills independently, skew
    bounded by days-per-series at any corpus size."""
    from ..operators.timeseries import time_bucket_gapfill

    ev = load_table(spark, sf_dir, "events")
    g = time_bucket_gapfill(ev, "event_type", "ts", "value", bucket="day")
    return g.select(
        "series",
        F.date_format("bucket_ts", "yyyy-MM-dd").alias("bucket_day"),
        "n_events",
        F.round("avg_value", 4).alias("avg_value"),
        F.round("first_value", 4).alias("first_value"),
        F.round("last_value", 4).alias("last_value"),
        F.round("locf_value", 4).alias("locf_value"),
        F.round("lin_value", 4).alias("lin_value"),
    ).orderBy("series", "bucket_day")


@register(
    "e11_counter_deltas",
    oracle="""
WITH d AS (
  SELECT event_type AS series, epoch_us(ts) AS ts_us, value,
         LAG(value) OVER w AS prev_v,
         LAG(epoch_us(ts)) OVER w AS prev_us
  FROM events
  WINDOW w AS (PARTITION BY event_type ORDER BY ts)
)
SELECT series, ts_us, ROUND(value, 6) AS value,
       ROUND(CASE WHEN prev_v IS NULL THEN NULL
                  WHEN value < prev_v THEN value
                  ELSE value - prev_v END, 6) AS delta,
       ROUND(CASE WHEN prev_us IS NULL OR ts_us = prev_us THEN NULL
                  WHEN value < prev_v
                  THEN value / ((ts_us - prev_us) / 1000000.0)
                  ELSE (value - prev_v) / ((ts_us - prev_us) / 1000000.0)
             END, 6) AS rate_per_sec,
       COALESCE(value < prev_v, FALSE) AS was_reset
FROM d ORDER BY series, ts_us
""",
    group="E",
)
def e11_counter_deltas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monotonic-counter deltas with reset detection (round 9) — the
    Prometheus ``increase``/``rate`` contract over the events stream
    (operators/timeseries.py counter_delta, unit-tested on hand-built
    reset schedules since round 8; this registers it for the driver's
    oracle gate). A counter that goes DOWN was reset (process
    restart): the increase since the previous sample is the new value
    itself, never a negative difference. Spark shape: ONE window per
    series ordered by time — a single hash exchange on the series key,
    per-series work bounded by samples-per-series at any corpus size,
    nothing collected. Elapsed time differences integer microseconds
    (exact) before one division, so the rate is bit-identical to the
    DuckDB oracle's epoch_us arithmetic."""
    from ..operators.timeseries import counter_delta

    ev = load_table(spark, sf_dir, "events")
    d = counter_delta(ev, "event_type", "ts", "value")
    return d.select(
        "series",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        F.round("value", 6).alias("value"),
        F.round("delta", 6).alias("delta"),
        F.round("rate_per_sec", 6).alias("rate_per_sec"),
        "was_reset",
    ).orderBy("series", "ts_us")


@register(
    "e12_m4_downsample",
    oracle="""
SELECT event_type AS series,
       epoch_us(date_trunc('day', ts)) AS bucket_us,
       COUNT(*)::BIGINT AS n_points,
       epoch_us(MIN(ts)) AS first_us,
       ROUND(arg_min(value, ts), 6) AS first_v,
       epoch_us(MAX(ts)) AS last_us,
       ROUND(arg_max(value, ts), 6) AS last_v,
       ROUND(MIN(value), 6) AS min_v,
       ROUND(MAX(value), 6) AS max_v
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
""",
    group="E",
)
def e12_m4_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 downsampling (round 9; Jugel et al., VLDB 2014) — per
    (series, day) the four points a line rendering needs: first, last,
    min, max. The dashboard/preview query that turns a billion-point
    series into 4 x buckets rows with no visible difference at
    bucket-per-pixel resolution. ONE hash aggregate with map-side
    partials (operators/timeseries.py m4_downsample): no window, no
    sort, no spine — a single exchange at any corpus size. Timestamps
    emitted as integer microseconds on both engines (exact)."""
    from ..operators.timeseries import m4_downsample

    ev = load_table(spark, sf_dir, "events")
    d = m4_downsample(ev, "event_type", "ts", "value", bucket="day")
    return d.select(
        "series",
        F.unix_micros(F.col("bucket_ts")).alias("bucket_us"),
        "n_points",
        F.unix_micros(F.col("first_ts")).alias("first_us"),
        F.round("first_v", 6).alias("first_v"),
        F.unix_micros(F.col("last_ts")).alias("last_us"),
        F.round("last_v", 6).alias("last_v"),
        F.round("min_v", 6).alias("min_v"),
        F.round("max_v", 6).alias("max_v"),
    ).orderBy("series", "bucket_us")


@register(
    "e13_lttb_downsample",
    oracle="""
WITH RECURSIVE pts AS (
  SELECT event_type AS series,
         epoch_us(ts) AS x,
         CAST(ROUND(value * 1000000) AS BIGINT) AS vq,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY epoch_us(ts),
                                     CAST(ROUND(value * 1000000) AS BIGINT)) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
),
mid AS (
  SELECT series, x, vq, ((rn - 2) * 22) // (n - 2) AS b
  FROM pts WHERE rn >= 2 AND rn <= n - 1 AND n > 24
),
nxt AS (
  SELECT series, b - 1 AS b, COUNT(*) AS cnt, SUM(x) AS sx, SUM(vq) AS sv
  FROM mid WHERE b >= 1 GROUP BY series, b
  UNION ALL
  SELECT series, 21 AS b, 1 AS cnt, x AS sx, vq AS sv
  FROM pts WHERE rn = n AND n > 24
),
sel AS (
  SELECT series, CAST(-1 AS BIGINT) AS b, x, vq FROM pts WHERE rn = 1 AND n > 24
  UNION ALL
  SELECT p.series, p.b,
         (max(struct_pack(
            a := abs(CAST(a.cnt * s.x - a.sx AS DOUBLE)
                       * CAST(p.vq - s.vq AS DOUBLE)
                     - CAST(s.x - p.x AS DOUBLE)
                       * CAST(a.sv - a.cnt * s.vq AS DOUBLE)),
            nx := -p.x, nvq := -p.vq, x := p.x, vq := p.vq))).x,
         (max(struct_pack(
            a := abs(CAST(a.cnt * s.x - a.sx AS DOUBLE)
                       * CAST(p.vq - s.vq AS DOUBLE)
                     - CAST(s.x - p.x AS DOUBLE)
                       * CAST(a.sv - a.cnt * s.vq AS DOUBLE)),
            nx := -p.x, nvq := -p.vq, x := p.x, vq := p.vq))).vq
  FROM sel s
  JOIN mid p ON p.series = s.series AND p.b = s.b + 1
  JOIN nxt a ON a.series = p.series AND a.b = p.b
  GROUP BY p.series, p.b
),
keep AS (
  SELECT series, x, vq FROM sel
  UNION ALL
  SELECT series, x, vq FROM pts WHERE rn = n AND n > 24
  UNION ALL
  SELECT series, x, vq FROM pts WHERE n <= 24
)
SELECT series, x AS ts_us, vq / 1000000.0 AS value
FROM keep ORDER BY series, ts_us, value
""",
    group="E",
)
def e13_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LTTB perceptual downsampling to 24 points per series (round 10,
    VERDICT r9 item 5; Steinarsson 2013) — the shape-preserving
    companion to e12's M4 envelope. The selection is sequential within
    a series, so the operator (operators/timeseries.py lttb_downsample)
    runs one vectorized applyInPandas per series — series parallelize,
    per-series work is one sort + one numpy pass; the 100-TB path
    pre-aggregates with e12's M4 to bound points-per-series first.
    Arithmetic is exact cross-engine (integer-microsecond timestamps,
    1e-6-unit values, one IEEE double op per comparison term), so the
    DuckDB oracle replays the algorithm RELATIONALLY: a recursive CTE
    walks the buckets left to right, arg_max re-picking exactly the
    operator's triangle-area maximization with identical tie-breaks."""
    from ..operators.timeseries import lttb_downsample

    ev = load_table(spark, sf_dir, "events")
    d = lttb_downsample(ev, "event_type", "ts", "value", n_out=24)
    return d.orderBy("series", "ts_us", "value")
