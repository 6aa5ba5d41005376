"""User-defined function surface: scalar Python UDF, vectorized pandas
UDF, grouped-map applyInPandas, pandas UDAF, and a Python UDTF.

These exist to prove the extension seams, not for the hot path — the
engine's own operators stay on built-in expressions. Where Python is
genuinely needed at scale, the pandas (Arrow-batched) forms here are
the pattern: ~10-100x over row-at-a-time UDFs.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf, udtf
from pyspark.sql.types import DoubleType, StringType


@udf(returnType=StringType())
def price_band(total: float) -> str:
    """J1: row-at-a-time scalar UDF (the slow path, kept tiny)."""
    if total is None:
        return None
    if total > 200000:
        return "big"
    if total > 50000:
        return "mid"
    return "small"


@pandas_udf(DoubleType())
def charge_vec(extended: pd.Series, discount: pd.Series, tax: pd.Series) -> pd.Series:
    """J2: Arrow-vectorized scalar UDF — whole columns per call."""
    return extended * (1.0 - discount) * (1.0 + tax)


def zscore_by_group(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """J3: grouped-map applyInPandas — per-group normalization. Each
    group lands on one executor as a pandas frame (watch group sizes:
    this is the operator for many small groups, not one giant one)."""
    out_schema = f"{group_col} int, id long, z double"

    def norm(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf[value_col]
        sd = v.std(ddof=1)
        z = (v - v.mean()) / sd if sd and sd > 0 else v * 0.0
        return pd.DataFrame(
            {group_col: pdf[group_col], "id": pdf["id"], "z": z}
        )

    return df.groupBy(group_col).applyInPandas(norm, schema=out_schema)


@pandas_udf(DoubleType())
def weighted_mean(value: pd.Series, weight: pd.Series) -> float:
    """J4: pandas UDAF (GROUPED_AGG when used inside groupBy().agg)."""
    w = weight.sum()
    return float((value * weight).sum() / w) if w else float("nan")


@udtf(returnType="token: string")
class TokenSplitter:
    """J5: Python UDTF (Spark 4) — one row per token."""

    def eval(self, text: str):  # noqa: D102
        if text:
            for t in text.split(" "):
                yield (t,)
