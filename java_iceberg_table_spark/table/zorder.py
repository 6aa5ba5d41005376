"""Z-order (Morton) multi-dimensional clustering.

The reference writes files in arrival order, so file min/max stats are
tight on the ingest-time column only; any predicate on another column
scans every file. A z-order rewrite interleaves the bits of several
key columns into one sort key, so files cover small HYPER-RECTANGLES
of the key space and per-file min/max stats prune scans on EVERY
participating dimension — the standard data-layout optimization for
multi-predicate workloads at 100 TB (a linear sort helps exactly one
column; z-order helps all of them at a small per-column cost).

Everything here is pure Spark expressions: the z-value is built from
shiftleft/shiftright/bitwise-and terms compiled into the plan, the
rewrite is repartitionByRange(zvalue) + sortWithinPartitions(zvalue)
— no UDF, no driver-side data movement (the only collect is the
per-column min/max, a scalar per dimension).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 16 bits/dimension: 65k cells per axis is far finer than any
# realistic file count; up to 3 dimensions (48 bits) fit a long.
ZBITS = 16


def zvalue_expr(cols: list[str], mins: dict[str, int], maxs: dict[str, int]) -> Column:
    """Morton code of ``cols``: each column scaled to [0, 2^ZBITS),
    bits interleaved round-robin (dimension i gets bit positions
    i, i+n, i+2n, …). Min/max are required up front so the expression
    is a pure literal-parameterized projection (one prior scalar agg
    provides them; at scale they come from table stats for free)."""
    n = len(cols)
    if n * ZBITS > 63:
        raise ValueError(f"z-order supports at most {63 // ZBITS} columns")
    top = (1 << ZBITS) - 1
    scaled = []
    for c in cols:
        lo, hi = int(mins[c]), int(maxs[c])
        span = max(hi - lo, 1)
        s = ((F.col(c).cast("long") - lo) * top / span).cast("long")
        scaled.append(F.least(F.lit(top), F.greatest(F.lit(0), s)))
    z = F.lit(0).cast("long")
    for b in range(ZBITS):
        for i, s in enumerate(scaled):
            bit = F.shiftright(s, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + i))
    return z


def minmax(df: DataFrame, cols: list[str]) -> tuple[dict[str, int], dict[str, int]]:
    """One scalar agg for all dimensions' bounds (model-scale collect)."""
    row = df.agg(
        *[F.min(c).alias(f"mn_{c}") for c in cols],
        *[F.max(c).alias(f"mx_{c}") for c in cols],
    ).collect()[0]
    return (
        {c: row[f"mn_{c}"] for c in cols},
        {c: row[f"mx_{c}"] for c in cols},
    )


def zorder_frame(df: DataFrame, cols: list[str], n_files: int) -> DataFrame:
    """Return ``df`` re-arranged into ``n_files`` z-ordered partitions
    (each output partition covers a contiguous z-range = a small
    hyper-rectangle set of the key space)."""
    mins, maxs = minmax(df, cols)
    z = zvalue_expr(cols, mins, maxs)
    return (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
    )
