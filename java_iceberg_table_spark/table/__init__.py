"""Lightweight Parquet + JSON-manifest table format.

From-scratch implementation of the reference's Iceberg capabilities
(cccs-jc/java-iceberg-table): snapshot-chained atomic commits with
optimistic concurrency (Writer.java:116,139-154), fast append without
manifest rewrite, partition pruning + min/max file skipping
(Writer.java:107, StorageQueueBasedBookkeeper.java:63-66),
metadata-only retention delete (FileBasedBookkeeper.java:182-192) and
snapshot expiry with reachability GC (Reaper.java:17-27) — driven from
PySpark with no Iceberg jar.
"""

from .catalog import Catalog
from .table import Table, create_table, load_table
from .transforms import (
    bucket,
    composite,
    day,
    hour,
    identity,
    month,
    truncate,
    year,
)

__all__ = [
    "Table",
    "Catalog",
    "create_table",
    "load_table",
    "truncate",
    "identity",
    "bucket",
    "composite",
    "year",
    "month",
    "day",
    "hour",
]
