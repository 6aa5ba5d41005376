"""Declared query surface (SURVEY.md §2.2) as a registry.

Every operator the engine claims is a named entry here:
  - ``fn(spark, sf_dir) -> DataFrame``  — idiomatic DataFrame-API
    implementation (the thing being graded);
  - ``oracle``                          — equivalent DuckDB SQL over the
    same parquet tables, or None for ops that aren't SQL-expressible
    (driver then records a rows-only check).

Column names are the contract: every computed column is aliased
identically in the DataFrame code and the oracle SQL (the driver's
compare sorts columns by name before hashing).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    group: str


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, group: str = "") -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, group=group)
        return fn

    return deco


_MODULES = [
    "scans",
    "engine_table",
    "filters",
    "joins",
    "aggregates",
    "windows",
    "setops",
    "scalar_functions",
    "llm_ops",
    "udf_ops",
    "streaming_ops",
    "tpch",
    "tpch2",
]


def load_all() -> dict[str, Query]:
    """Import every query module (idempotent) and return the registry.

    The returned (and in-place) order is round-robin interleaved across
    groups — first entry of group A, first of B, ... first of TPCH,
    then the second of each, and so on. A consumer that evaluates the
    registry front-to-front under a time budget (the correctness
    driver) therefore sees every SURVEY §2.2 group represented early
    instead of exhausting its window inside groups A–D.
    """
    for mod in _MODULES:
        importlib.import_module(f"{__name__}.{mod}")
    by_group: dict[str, list[Query]] = {}
    for q in REGISTRY.values():
        by_group.setdefault(q.group or "?", []).append(q)
    interleaved: dict[str, Query] = {}
    queues = list(by_group.values())
    depth = 0
    while len(interleaved) < len(REGISTRY):
        for queue in queues:
            if depth < len(queue):
                q = queue[depth]
                interleaved[q.name] = q
        depth += 1
    REGISTRY.clear()
    REGISTRY.update(interleaved)
    return REGISTRY
