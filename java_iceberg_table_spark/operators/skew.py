"""Skew-handling join strategies.

AQE's skew-join (on in session.py) splits oversized partitions at
runtime, but only for sort-merge joins and only after a shuffle has
materialized. Salting handles the cases AQE can't: aggregations with a
hot key, and joins where one side must replicate.

``salted_join``: big side gets a random salt in [0, S); small side is
exploded S-fold with every salt value; join on (key, salt). The hot
key's rows spread over S tasks instead of one. Exact — the replication
side carries every salt, so no pair is lost or duplicated.

``salted_aggregate``: two-phase agg — partial by (key, salt), final by
key. For algebraic aggregates (sum/count/min/max/avg-as-sum+count)
this is exact and turns one hot reducer into S + 1 small ones.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join resilient to a skewed ``key`` on the big side.

    The salt on the big side is deterministic (hash of all columns mod
    salts) rather than rand() so retried tasks produce identical
    output (speculative execution safe)."""
    big_salted = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salts))
    )
    small_exploded = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salts)]))
    )
    out = big_salted.join(small_exploded, [key, "__salt"], how)
    return out.drop("__salt")


def salted_aggregate(
    df: DataFrame,
    key: str,
    agg_col: str,
    salts: int = 16,
) -> DataFrame:
    """sum/count per key via salt-partials: returns (key, sum_v, cnt_v).
    Shape generalizes to any algebraic aggregate."""
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(F.col(agg_col)), F.lit(salts))
    )
    partial = salted.groupBy(key, "__salt").agg(
        F.sum(agg_col).alias("__s"), F.count(F.lit(1)).alias("__c")
    )
    return partial.groupBy(key).agg(
        F.sum("__s").alias("sum_v"), F.sum("__c").alias("cnt_v")
    )
