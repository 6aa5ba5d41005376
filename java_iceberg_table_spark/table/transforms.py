"""Partition transforms.

The reference uses exactly one: Iceberg ``truncate(width)`` on a long
column (5-minute µs buckets: Constants.java:25,33-35). Semantics for
integers: v -> v - (((v % W) + W) % W), i.e. floor to the bucket start —
identical to the retention-cutoff floor at FileBasedBookkeeper.java:186.

This module carries the general Iceberg-spec transform family the
engine supports:

- ``truncate(col, W)`` — range-expressible (bucket = [start, start+W));
  prunes range AND equality predicates; the reference's transform.
- ``identity(col)``    — range-expressible with width 1; the value IS
  the partition; the strongest pruning (exact partition elimination).
- ``bucket(col, N)``   — hash bucket; order-destroying, so it prunes
  EQUALITY predicates only (a point lookup or IN-list hits exactly one
  bucket in N — the transform that makes key-colocated joins and
  point-lookup tables cheap at 100 TB). Hash = CRC32 over the value's
  string rendering: CRC32 is bit-identical between a Spark expression
  (``F.crc32``) and the Python standard library (``zlib.crc32``), so
  executors (write-side bucketing) and the driver (planning-time
  pruning) agree with no shared native library — the same hash-parity
  trick as table/bloom_index.py.
- ``year/month/day/hour(col)`` — Iceberg temporal transforms over
  timestamp / date / epoch-µs long columns. The partition value is an
  integral offset since epoch (years / months / days / hours —
  Iceberg's own partition-value convention), always computed in UTC
  calendar terms so the bucket a row lands in never depends on the
  session timezone (Spark side uses ``unix_micros`` + pure DATE
  arithmetic, both timezone-free; ``F.year(timestamp_col)`` would
  silently re-bucket under a different session tz). Temporal buckets
  are MONOTONIC in the source value but not fixed-width in it
  (months/years vary), so they carry no value-domain ``bucket_range``;
  planning prunes them in BUCKET space instead — a range predicate's
  value maps through ``apply_py`` to a bucket ordinal and entries
  compare ordinally (see ``Table._entry_may_match``). This is the
  transform projection Iceberg performs for partition pruning.

Every transform exposes the same surface:
  ``apply_py(v)``        Python-side bucket of one value (planning,
                         bookkeeper stats fallback);
  ``apply_col(col)``     the SAME bucketing as a Spark Column (the
                         write path's ``__pb`` column);
  ``bucket_range(b)``    [lo, hi) of source values in bucket ``b``, or
                         None when the transform is not
                         range-expressible (bucket);
  ``may_contain(b, v)``  can value ``v`` live in bucket ``b`` —
                         equality pruning for ALL transforms;
  ``to_json/from_json``  the spec-log representation.

Partition values are kept integral (identity is restricted to integer
columns) so manifest JSON, ``__pb=`` directory names, and pruning
comparisons stay type-stable end to end.
"""

from __future__ import annotations

import zlib
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

    def may_contain(self, bucket: int, value) -> bool:
        try:
            return bucket <= value < bucket + self.width
        except TypeError:
            return True  # incomparable: cannot prune

    def apply_arrow(self, col):
        """Arrow-side bucketing for the connector's executor write
        path. floor-mod v - (((v mod W) + W) mod W) in EXACT integer
        arithmetic (Arrow integer divide truncates toward zero; fix up
        negative remainders). A float64 detour would lose precision
        past 2^53 — e.g. nanosecond timestamps — and mislabel buckets,
        making plan_files silently prune files that do contain matching
        rows. Mirrors apply_py exactly."""
        import pyarrow as pa
        import pyarrow.compute as pc

        w = pa.scalar(self.width, type=col.type)
        r = pc.subtract(col, pc.multiply(pc.divide(col, w), w))
        m = pc.if_else(pc.less(r, pa.scalar(0, col.type)), pc.add(r, w), r)
        return pc.subtract(col, m)

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


@dataclass(frozen=True)
class IdentityTransform:
    source_column: str

    # width of the conceptual bucket: identity is truncate(1) over ints
    width: int = 1

    def apply_py(self, value: int) -> int:
        return int(value)

    def apply_col(self, col: Column | str) -> Column:
        c = F.col(col) if isinstance(col, str) else col
        return c.cast("long")

    def bucket_range(self, bucket: int) -> tuple[int, int]:
        return bucket, bucket + 1

    def may_contain(self, bucket: int, value) -> bool:
        try:
            return bucket == int(value)
        except (TypeError, ValueError):
            return True

    def apply_arrow(self, col):
        import pyarrow as pa

        return col.cast(pa.int64())

    def to_json(self) -> dict:
        return {"transform": "identity", "source_column": self.source_column}

    @staticmethod
    def from_json(d: dict) -> "IdentityTransform":
        assert d["transform"] == "identity"
        return IdentityTransform(d["source_column"])


def _crc_bucket(value, n: int) -> int:
    return zlib.crc32(str(value).encode("utf-8")) % n


@dataclass(frozen=True)
class BucketTransform:
    source_column: str
    n: int

    def apply_py(self, value) -> int:
        return _crc_bucket(value, self.n)

    def apply_col(self, col: Column | str) -> Column:
        c = F.col(col) if isinstance(col, str) else col
        # CRC32 over the string rendering — bit-identical to apply_py
        # for integer and string columns (Spark's CAST(long AS STRING)
        # == Python str(int)); floats are refused at construction
        return F.pmod(F.crc32(c.cast("string").cast("binary")), F.lit(self.n))

    def bucket_range(self, bucket: int) -> None:
        return None  # hashing destroys order: no range pruning

    def may_contain(self, bucket: int, value) -> bool:
        # prune only when the predicate value's string rendering is
        # guaranteed to match the stored column's (int vs int, str vs
        # str). A float predicate against a long column renders "42.0"
        # vs "42" — hashing it would prune the RIGHT file; equality
        # across numeric types is the engine's residual filter's job,
        # pruning must stay conservative.
        if isinstance(value, bool) or not isinstance(value, (int, str)):
            return True
        return bucket == _crc_bucket(value, self.n)

    def apply_arrow(self, col):
        """CRC32-of-string per value. Not vectorizable in Arrow compute
        (no crc32 kernel); the Python loop runs EXECUTOR-side over the
        task's own batch — the driver never touches row data, so the
        cost is per-task and parallel, the shape that matters."""
        import pyarrow as pa

        return pa.array(
            (None if v is None else _crc_bucket(v, self.n) for v in col.to_pylist()),
            type=pa.int64(),
        )

    def to_json(self) -> dict:
        return {
            "transform": "bucket",
            "source_column": self.source_column,
            "n": self.n,
        }

    @staticmethod
    def from_json(d: dict) -> "BucketTransform":
        assert d["transform"] == "bucket"
        return BucketTransform(d["source_column"], int(d["n"]))


Transform = TruncateTransform | IdentityTransform | BucketTransform

_KINDS = {
    "truncate": TruncateTransform,
    "identity": IdentityTransform,
    "bucket": BucketTransform,
}


def transform_from_json(d: dict | None) -> Transform | None:
    """Spec-log JSON -> transform (the one parse every reader of
    ``partition_spec`` / the spec log goes through)."""
    if d is None:
        return None
    kind = d.get("transform")
    cls = _KINDS.get(kind)
    if cls is None:
        raise ValueError(f"unknown partition transform {kind!r}")
    return cls.from_json(d)


def validate_transform(t: Transform | None, schema) -> None:
    """Check a transform against the table schema at create /
    spec-evolution time — the write path and planning both assume
    integral partition values (``__pb=`` directory parsing, manifest
    JSON, range pruning), and bucket hashing assumes a string
    rendering stable between Spark and Python (ints and strings only;
    a float column renders "42.0" engine-dependently)."""
    if t is None:
        return
    field = next((f for f in schema.fields if f.name == t.source_column), None)
    if field is None:
        raise ValueError(
            f"partition source column {t.source_column!r} not in schema"
        )
    ds = field.dataType.simpleString()
    integral = ds in ("tinyint", "smallint", "int", "bigint")
    if isinstance(t, BucketTransform):
        if not (integral or ds == "string"):
            raise ValueError(
                f"bucket[N] needs an integer or string column; "
                f"{t.source_column!r} is {ds}"
            )
    elif not integral:
        raise ValueError(
            f"{type(t).__name__} needs an integer column; "
            f"{t.source_column!r} is {ds}"
        )


def truncate(source_column: str, width: int) -> TruncateTransform:
    return TruncateTransform(source_column, width)


def identity(source_column: str) -> IdentityTransform:
    return IdentityTransform(source_column)


def bucket(source_column: str, n: int) -> BucketTransform:
    if n <= 0:
        raise ValueError("bucket(N) requires N >= 1")
    return BucketTransform(source_column, n)
