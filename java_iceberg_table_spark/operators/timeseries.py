"""Time-series gap filling over bucketed aggregates (the hypertable
rollup family: TimescaleDB's ``time_bucket_gapfill`` + ``locf`` +
``interpolate``, expressed Spark-first).

The shape at 100 TB: the observed aggregate is one hash shuffle keyed
by (series, bucket) with map-side partial aggregation; the bucket
SPINE (series x buckets) is generated from a sequence expression —
metadata-scale, never a scan; the fills are window functions over the
spine, partitioned by series and ordered by bucket, so each series
fills independently (one exchange keyed by series, skew bounded by
buckets-per-series, not rows). Nothing here is per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def time_bucket_gapfill(
    df: DataFrame,
    series_col: str,
    ts_col: str,
    value_col: str,
    bucket: str = "day",
) -> DataFrame:
    """Bucketed average per (series, bucket) over a DENSE bucket spine
    spanning the data's global [min, max] — every series gets a row
    for every bucket — with three fill columns for the gaps:

    - ``avg_value``  — the observed aggregate, NULL in gaps;
    - ``locf_value`` — last observation carried forward;
    - ``lin_value``  — linear interpolation between the neighboring
      observed buckets (edges fall back to the one existing side).

    Returns (series, bucket_ts, n_events, avg_value, first_value,
    last_value, locf_value, lin_value) — first/last are the earliest/
    latest observation in the bucket (NULL in gaps), tie-broken by
    value on timestamp collisions so re-runs and oracles agree;
    bucket_ts is a date for ``day`` buckets, a timestamp for
    ``hour``. Buckets must be UNIFORM so interpolation weights are
    exact integer step counts (day: datediff; hour: epoch/3600) —
    month buckets are non-uniform and deliberately unsupported."""
    if bucket == "day":
        bucket_expr = F.to_date(ts_col)
        step = F.expr("interval 1 day")
    elif bucket == "hour":
        bucket_expr = F.date_trunc("hour", F.col(ts_col))
        step = F.expr("interval 1 hour")
    else:
        raise ValueError(f"unsupported bucket {bucket!r} (day | hour)")
    base = df.select(
        F.col(series_col).alias("series"),
        bucket_expr.alias("bucket_ts"),
        F.col(ts_col).alias("ts"),
        F.col(value_col).cast("double").alias("v"),
    )
    # first/last observation per bucket (round 10): min/max of the
    # (ts, v) struct — tie-broken by value when timestamps collide, so
    # both engines pick identically — then the value field extracted.
    # Still ONE map-side-combinable hash aggregate, no window.
    observed = base.groupBy("series", "bucket_ts").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.avg("v").alias("avg_value"),
        F.min(F.struct("ts", "v")).getField("v").alias("first_value"),
        F.max(F.struct("ts", "v")).getField("v").alias("last_value"),
    )
    # global span: ONE tiny aggregate row, broadcast into the spine —
    # the spine itself is sequence()-generated, never a data scan
    span = base.agg(
        F.min("bucket_ts").alias("lo"), F.max("bucket_ts").alias("hi")
    )
    spine = (
        base.select("series")
        .distinct()
        .crossJoin(F.broadcast(span))
        .select(
            "series",
            F.explode(
                F.sequence("lo", "hi", step)
            ).alias("bucket_ts"),
        )
    )
    g = spine.join(observed, ["series", "bucket_ts"], "left")
    w_back = (
        Window.partitionBy("series")
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("series")
        .orderBy("bucket_ts")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("avg_value").isNotNull(), F.col("bucket_ts"))
    prev_v = F.last("avg_value", ignorenulls=True).over(w_back)
    prev_d = F.last(obs_day, ignorenulls=True).over(w_back)
    next_v = F.first("avg_value", ignorenulls=True).over(w_fwd)
    next_d = F.first(obs_day, ignorenulls=True).over(w_fwd)
    if bucket == "day":
        steps_between = F.datediff(next_d, prev_d)
        steps_from_prev = F.datediff(F.col("bucket_ts"), prev_d)
    else:  # hour: uniform 3600-second steps in epoch seconds
        steps_between = (
            next_d.cast("double") - prev_d.cast("double")
        ) / 3600.0
        steps_from_prev = (
            F.col("bucket_ts").cast("double") - prev_d.cast("double")
        ) / 3600.0
    frac = steps_from_prev / steps_between
    lin = (
        F.when(F.col("avg_value").isNotNull(), F.col("avg_value"))
        .when(prev_v.isNull(), next_v)
        .when(next_v.isNull(), prev_v)
        .otherwise(prev_v + (next_v - prev_v) * frac)
    )
    return g.select(
        "series",
        "bucket_ts",
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        "avg_value",
        "first_value",
        "last_value",
        prev_v.alias("locf_value"),
        lin.alias("lin_value"),
    )


def counter_delta(
    df: DataFrame,
    series_col: str,
    ts_col: str,
    counter_col: str,
) -> DataFrame:
    """Monotonic-counter deltas with RESET detection (the Prometheus
    ``increase``/``rate`` contract): a counter that goes DOWN was
    reset (process restart), so the increase since the previous sample
    is the new value itself, not a negative difference. One window
    per series ordered by time — the same single-exchange shape as the
    gap-fill windows; nothing is collected.

    Returns (series, ts, value, delta, rate_per_sec, was_reset):
    ``delta`` is NULL on each series' first sample (no baseline),
    ``rate_per_sec`` divides by the elapsed seconds to the previous
    sample (NULL when elapsed is zero).

    Elapsed time is computed from integer microseconds
    (``unix_micros(ts) - unix_micros(prev)``, exact) and divided by
    1e6 once — not from per-timestamp double seconds, whose two
    roundings before the subtraction would make the rate diverge from
    any engine that differences integer epochs (DuckDB ``epoch_us``)."""
    w = Window.partitionBy("series").orderBy("ts")
    base = df.select(
        F.col(series_col).alias("series"),
        F.col(ts_col).alias("ts"),
        F.col(counter_col).cast("double").alias("value"),
    )
    prev_v = F.lag("value").over(w)
    prev_us = F.lag(F.unix_micros(F.col("ts"))).over(w)
    reset = F.col("value") < prev_v
    delta = (
        F.when(prev_v.isNull(), F.lit(None).cast("double"))
        .when(reset, F.col("value"))
        .otherwise(F.col("value") - prev_v)
    )
    elapsed = (
        (F.unix_micros(F.col("ts")) - prev_us).cast("double") / F.lit(1e6)
    )
    return base.select(
        "series",
        "ts",
        "value",
        delta.alias("delta"),
        F.when(elapsed > 0, delta / elapsed).alias("rate_per_sec"),
        F.coalesce(reset, F.lit(False)).alias("was_reset"),
    )


def m4_downsample(
    df: DataFrame,
    series_col: str,
    ts_col: str,
    value_col: str,
    bucket: str = "day",
) -> DataFrame:
    """M4 downsampling (Jugel et al., VLDB 2014): per (series, time
    bucket) keep the four points a line rendering actually needs —
    first, last, min and max — so a billion-point series reduces to
    4 x buckets rows with NO visible difference at bucket-per-pixel
    resolution. The canonical dashboard/preview query over raw event
    history.

    Spark shape: ONE hash aggregate keyed by (series, bucket) with
    map-side partials — min/max are plain aggregates, first/last are
    ``min_by``/``max_by`` on the timestamp. No window, no sort, no
    spine: this is strictly cheaper than the gap-fill family and
    scales as a single exchange at any corpus size. first/last are
    deterministic whenever timestamps are unique within a bucket;
    min_v/max_v are plain value extrema, tie-free by construction.

    Returns one row per observed (series, bucket):
    (series, bucket_ts, n_points, first_ts, first_v, last_ts, last_v,
    min_v, max_v)."""
    b = F.date_trunc(bucket, F.col(ts_col)).alias("bucket_ts")
    ts = F.col(ts_col)
    v = F.col(value_col)
    return (
        df.select(F.col(series_col).alias("series"), b, ts.alias("__ts"), v.alias("__v"))
        .groupBy("series", "bucket_ts")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.min("__ts").alias("first_ts"),
            F.min_by("__v", "__ts").alias("first_v"),
            F.max("__ts").alias("last_ts"),
            F.max_by("__v", "__ts").alias("last_v"),
            F.min("__v").alias("min_v"),
            F.max("__v").alias("max_v"),
        )
    )


def lttb_downsample(
    df: DataFrame,
    series_col: str,
    ts_col: str,
    value_col: str,
    n_out: int = 24,
) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013)
    — the perceptual line-chart downsampler: keep the first and last
    point of each series, split the middle into ``n_out - 2``
    index-equal buckets, and from each bucket keep the point forming
    the LARGEST TRIANGLE with the previously kept point and the next
    bucket's centroid. Complements e12's M4 (exact min/max/first/last
    envelope): M4 preserves extremes, LTTB preserves shape.

    Spark shape: the selection is inherently SEQUENTIAL within a
    series (each pick depends on the previous pick), so it runs as
    one vectorized ``applyInPandas`` per series — series are the unit
    of parallelism, per-series work is one sort + one numpy pass. At
    100 TB a series outgrows one task's memory long before this loop
    matters; the production composition is M4/time-bucket
    pre-aggregation (e12: one map-side-combinable hash aggregate) down
    to ~1e5 points per series, then LTTB over THAT — same pattern as
    topk_view feeding the e1 gate.

    Cross-engine determinism (the oracle replays this relationally):
    timestamps quantize to integer microseconds and values to integer
    1e-6 units, so bucket sums are exact integers in both engines;
    the area comparison is |double(na*xp - SX) * double(vc - vp)
    - double(xp - xc) * double(SV - na*vp)| — every factor an
    exactly-represented integer, every product/difference one IEEE
    double op, identical bit patterns on both sides. Ties break to
    the smallest (x, vq). Points order by (x, vq) within a series —
    a caller whose (ts, value) pairs collide should pre-dedup or
    extend the value column (total order is the contract).

    Returns (series, ts_us, value), ≤ n_out rows per series (all
    points when a series has ≤ n_out)."""
    import numpy as np

    if n_out < 3:
        raise ValueError("lttb_downsample needs n_out >= 3")
    nb = n_out - 2
    base = df.select(
        F.col(series_col).alias("series"),
        F.unix_micros(F.col(ts_col)).alias("x"),
        F.round(F.col(value_col).cast("double") * 1e6).cast("long").alias("vq"),
    )

    def one_series(pdf):
        import pandas as pd

        pdf = pdf.sort_values(["x", "vq"], kind="mergesort").reset_index(
            drop=True
        )
        n = len(pdf)
        x = pdf["x"].to_numpy(np.int64)
        v = pdf["vq"].to_numpy(np.int64)
        if n <= n_out:
            sel = list(range(n))
        else:
            # every term of the area comparison is TRANSLATION-
            # INVARIANT ((na*xp - SX), (vc - vp), (xp - xc),
            # (SV - na*vp) all cancel a constant shift), so the sums
            # run over series-relative coordinates: absolute
            # epoch-microseconds (~1.75e15) would silently wrap
            # numpy's int64 accumulator once a bucket exceeds ~5,270
            # points, corrupting the maximization with no error while
            # the oracle's HUGEINT sums stay exact (round-10 review
            # finding, numeric repro at 14k points). The integers —
            # and therefore the IEEE doubles both engines compare —
            # are identical to the absolute-coordinate oracle's.
            xr = x - x[0]  # sorted by x, so x[0] is the series min
            vr = v - int(v.min())
            mid = n - 2
            b = (np.arange(mid, dtype=np.int64) * nb) // mid  # bucket of rn-2
            starts = np.searchsorted(b, np.arange(nb), side="left") + 1
            ends = np.searchsorted(b, np.arange(nb), side="right") + 1
            mb = int((ends - starts).max())
            if (mb + 1) * max(int(xr[-1]), int(vr.max()), 1) >= 2**62:
                raise ValueError(
                    "lttb_downsample: bucket sums would overflow int64 "
                    "(series span x bucket size too large) — raise n_out "
                    "or pre-aggregate the series (e.g. M4) first"
                )
            sel = [0]
            prev = 0
            for k in range(nb):
                s, e = int(starts[k]), int(ends[k])
                if k < nb - 1:
                    s2, e2 = int(starts[k + 1]), int(ends[k + 1])
                    na = e2 - s2
                    sx = int(xr[s2:e2].sum())
                    sv = int(vr[s2:e2].sum())
                else:  # last middle bucket pairs with the final point
                    na, sx, sv = 1, int(xr[n - 1]), int(vr[n - 1])
                xp, vp = int(xr[prev]), int(vr[prev])
                t1 = float(na * xp - sx) * (vr[s:e] - vp).astype(np.float64)
                t2 = (xp - xr[s:e]).astype(np.float64) * float(sv - na * vp)
                area2 = np.abs(t1 - t2)
                # max area, ties to smallest (x, vq): lexsort is
                # last-key-primary, so order keys (vq, x, -area)
                j = s + int(np.lexsort((vr[s:e], xr[s:e], -area2))[0])
                sel.append(j)
                prev = j
            sel.append(n - 1)
        out = pdf.iloc[sel]
        return pd.DataFrame(
            {
                "series": out["series"].to_numpy(),
                "ts_us": out["x"].to_numpy(np.int64),
                "value": out["vq"].to_numpy(np.int64) / 1e6,
            }
        )

    series_type = base.schema["series"].dataType.simpleString()
    return base.groupBy("series").applyInPandas(
        one_series, schema=f"series {series_type}, ts_us long, value double"
    )
