"""As-of (merge-asof) join: for each left row, the latest right row at
or before the left timestamp, per key.

Spark has no built-in as-of join; the naive range join explodes into
O(left x right-per-key) pairs. This operator uses the union+window
formulation instead: tag both sides, sort within key by (ts, side)
with right rows first at ties, and carry the last-seen right payload
forward with ``last(..., ignorenulls)``. One hash shuffle on the key +
one per-partition sort — linear in input, no pair explosion, skew
handled by AQE. This is the formulation that survives 100 TB; the
join+max-aggregate equivalent (query c12) is the correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    payload: list[str],
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join.

    Returns ``left`` columns plus ``<payload><suffix>`` columns from
    the latest right row with ``right_ts <= left_ts`` per ``key``
    (null when no earlier right row exists).
    """
    lcols = left.columns
    l = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).cast("timestamp").alias("__ts"),
        F.lit(1).alias("__side"),  # left sorts after right at ts ties (<= semantics)
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__p_{c}") for c in payload],
    )
    r = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).cast("timestamp").alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"__p_{c}") for c in payload],
    )
    unioned = l.unionByName(r)
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "__side",
        *lcols,
        *[
            F.last(f"__p_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in payload
        ],
    )
    return carried.filter(F.col("__side") == 1).drop("__side")
