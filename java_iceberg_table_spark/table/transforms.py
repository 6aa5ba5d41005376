"""Partition transforms.

The reference uses exactly one: Iceberg ``truncate(width)`` on a long
column (5-minute µs buckets: Constants.java:25,33-35). Semantics for
integers: v -> v - (((v % W) + W) % W), i.e. floor to the bucket start —
identical to the retention-cutoff floor at FileBasedBookkeeper.java:186.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass(frozen=True)
class TruncateTransform:
    source_column: str
    width: int

    def apply_py(self, value: int) -> int:
        return value - (value % self.width)  # Python % is already floor-mod

    def apply_col(self, col: Column | str) -> Column:
        c = F.col(col) if isinstance(col, str) else col
        return c - F.pmod(c, F.lit(self.width))

    def bucket_range(self, bucket: int) -> tuple[int, int]:
        """[start, end) of values mapping to this bucket."""
        return bucket, bucket + self.width

    def to_json(self) -> dict:
        return {
            "transform": "truncate",
            "source_column": self.source_column,
            "width": self.width,
        }

    @staticmethod
    def from_json(d: dict) -> "TruncateTransform":
        assert d["transform"] == "truncate"
        return TruncateTransform(d["source_column"], int(d["width"]))


def truncate(source_column: str, width: int) -> TruncateTransform:
    return TruncateTransform(source_column, width)
