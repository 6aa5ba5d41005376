"""Bloom-filter membership prefilter, expression-side.

The intended shape at 100 TB: a SMALL reference set (a benchmark
suite, a blocklist, yesterday's ingested keys) is hashed into an
m-bit filter ONCE; the filter ships to every executor as a literal,
and the full-scale corpus probes it as a pure projection (k xxhash64
calls + bit lookups per row, no join, no shuffle). Probe-positives
then pay the exact verification join, whose input the filter has
already cut by orders of magnitude. Bloom membership has no false
negatives, so prefilter + exact verify is EXACTLY the semantics of
the full join.

Representation: the set bit positions as a literal map (sparse form
of the m-bit array — identical membership semantics, and Spark's
literal-map lookup is a hash probe). Build is a driver-side collect
of the reference set's bit positions — metadata-scale by construction
(<= k * |reference| positions, deduped).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bloom_positions(col: Column, m: int, k: int) -> Column:
    """array<int> of the k bit positions for one value (seeded xxhash64)."""
    return F.array(
        *[F.pmod(F.xxhash64(col, F.lit(s)), F.lit(m)).cast("int") for s in range(k)]
    )


def bloom_build_bits(df: DataFrame, col: Column, m: int = 16384, k: int = 5) -> list[int]:
    """Collect the reference set's distinct bit positions (sorted)."""
    rows = (
        df.select(F.explode(bloom_positions(col, m, k)).alias("pos"))
        .distinct()
        .collect()
    )
    return sorted(r["pos"] for r in rows)


def bloom_probe(bits: list[int], col: Column, m: int, k: int) -> Column:
    """Boolean: all k bit positions present in the filter (possible member)."""
    from itertools import chain

    if not bits:
        return F.lit(False)
    bit_map = F.create_map(
        *chain.from_iterable((F.lit(int(p)), F.lit(True)) for p in bits)
    )
    pos = bloom_positions(col, m, k)
    return F.forall(pos, lambda p: F.element_at(bit_map, p).isNotNull())
