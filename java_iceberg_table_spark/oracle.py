"""Local DuckDB-oracle harness, mirroring the driver's correctness gate.

The driver runs each ``queries()`` entry in Spark and its
``oracle_sql()`` entry in DuckDB over the same parquet tables, sorts
columns by name, and hash-compares values. This module reproduces that
locally so every query is validated before the driver sees it.
"""

from __future__ import annotations

import math
import os
from typing import Any

import duckdb
import numpy as np
import pandas as pd

from .fixtures import TABLE_NAMES

FLOAT_TOL = 1e-4  # vector-math group needs 1e-4; everything else passes far tighter


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    """Register the fixture parquet files as views, as the driver does."""
    con = duckdb.connect()
    for name in TABLE_NAMES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    return con


def _canon_cell(v: Any) -> Any:
    if v is None:
        return None
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(_canon_cell(x) for x in v)
    if isinstance(v, (np.floating, float)):
        f = float(v)
        return None if math.isnan(f) else round(f, 9)
    if isinstance(v, np.integer):
        return int(v)
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return bytes(v)
    return v


def canonicalize(df: pd.DataFrame) -> list[tuple]:
    df = df.reindex(sorted(df.columns), axis=1)
    rows = [tuple(_canon_cell(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return sorted(rows, key=lambda r: tuple((x is None, str(type(x)), x) for x in r))


def _cells_equal(a: Any, b: Any) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, tuple) and isinstance(b, tuple):
        return len(a) == len(b) and all(_cells_equal(x, y) for x, y in zip(a, b))
    if isinstance(a, float) or isinstance(b, float):
        if a is None or b is None:
            return False
        try:
            return abs(float(a) - float(b)) <= FLOAT_TOL
        except (TypeError, ValueError):
            return False
    return a == b


def compare(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    problems: list[str] = []
    sp_cols, dk_cols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if sp_cols != dk_cols:
        return [f"column mismatch: spark={sp_cols} duckdb={dk_cols}"]
    # Driver-exact dtype parity: the driver's value-hash sees the raw
    # pandas cells, so an int64 Spark column vs a float64 DuckDB column
    # (e.g. an uncast SUM(bigint) coming back as HUGEINT->float64)
    # hash-mismatches even when every value is numerically equal. The
    # canonicalization below would coerce that away, so check dtypes
    # FIRST — this is the exact bug class that cost round 4 five rows.
    if len(spark_pdf) and len(duck_pdf):
        for c in sp_cols:
            sd, dd = spark_pdf[c].dtype, duck_pdf[c].dtype
            if sd != dd:
                problems.append(f"dtype mismatch col {c!r}: spark={sd} duckdb={dd}")
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"row count: spark={len(spark_pdf)} duckdb={len(duck_pdf)}")
    sp_rows, dk_rows = canonicalize(spark_pdf), canonicalize(duck_pdf)
    for i, (a, b) in enumerate(zip(sp_rows, dk_rows)):
        if not _cells_equal(a, b):
            problems.append(f"row {i}: spark={a!r} duckdb={b!r}")
            if len(problems) >= 5:
                problems.append("... (truncated)")
                break
    return problems
