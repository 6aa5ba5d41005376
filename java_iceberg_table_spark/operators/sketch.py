"""Count-min sketch (Cormode & Muthukrishnan 2005) over token streams.

Why a sketch at 100 TB: an exact token frequency table costs a shuffle
whose cardinality is the vocabulary (fine for words, explosive for
n-grams / URLs / user ids). The CMS state is a FIXED d x w counter
grid no matter the corpus: one explode + one groupBy over (row,
bucket) pairs — shuffle cardinality is at most d*w regardless of
input, and the grid merges across partitions/batches by addition
(map-side combine does most of the work).

Determinism: seeded xxhash64 row hashes — same corpus, same sketch.
Point estimates are min over rows of the bucket counters; the classic
guarantee est >= true always holds (counters only ever over-count),
and est <= true + eps*N with probability 1-delta for w = e/eps,
d = ln(1/delta).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket(col, row_seed: int, width: int):
    return F.pmod(F.xxhash64(col, F.lit(row_seed)), F.lit(width))


def cms_build(
    items: DataFrame, item_col: str, depth: int = 4, width: int = 256, seed: int = 42
) -> DataFrame:
    """Build the d x w sketch: (row, bucket, cnt), at most depth*width
    rows. ONE shuffle whose key space is the grid, not the vocabulary."""
    grid = items.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        _bucket(F.col(item_col), seed + i, width).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("rb")
    )
    return grid.groupBy(F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket")).agg(
        F.count(F.lit(1)).alias("cnt")
    )


def cms_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 256,
    seed: int = 42,
) -> DataFrame:
    """Point-estimate each query item: min over rows of its bucket
    counter. The sketch side broadcasts (d*w rows, model-scale); query
    items never shuffle."""
    probes = queries.select(
        item_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("row"),
                        _bucket(F.col(item_col), seed + i, width).alias("bucket"),
                    )
                    for i in range(depth)
                ]
            )
        ).alias("rb"),
    ).select(item_col, F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(sketch), ["row", "bucket"], "left")
        .fillna(0, subset=["cnt"])
        .groupBy(item_col)
        .agg(F.min("cnt").alias("cms_estimate"))
    )
