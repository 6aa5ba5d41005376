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

import datetime as _dt
import zlib
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F


@dataclass(frozen=True)
class TruncateTransform:
    source_column: str
    width: int

    # monotone non-decreasing in the source value: range predicates
    # project into bucket space (see Table._entry_may_match)
    monotonic = True

    def apply_py(self, value: int) -> int:
        return value - (value % self.width)  # Python % is already floor-mod

    def apply_col(self, col: Column | str, dtype: str | None = None) -> Column:
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

    monotonic = True

    def apply_py(self, value: int) -> int:
        return int(value)

    def apply_col(self, col: Column | str, dtype: str | None = None) -> Column:
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

    monotonic = False  # hashing destroys order: equality pruning only

    def apply_py(self, value) -> int:
        return _crc_bucket(value, self.n)

    def apply_col(self, col: Column | str, dtype: str | None = None) -> Column:
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


_US_PER = {"hour": 3_600_000_000, "day": 86_400_000_000}
_EPOCH_DATE = _dt.date(1970, 1, 1)


def _value_to_epoch_us(value) -> int:
    """One value -> epoch microseconds, UTC. Accepts the renderings a
    predicate or a data row can arrive in: datetime (naive = UTC, the
    engine's storage convention; aware converted), date (UTC
    midnight), ISO-8601 string, or a raw int already in the engine's
    epoch-µs convention (Constants.java:25 — timeperiod columns)."""
    import calendar

    if isinstance(value, bool):
        raise TypeError("boolean is not a temporal value")
    if isinstance(value, int):
        return value  # already epoch µs (engine long convention)
    if isinstance(value, str):
        value = _dt.datetime.fromisoformat(value)
    if isinstance(value, _dt.datetime):
        # timegm is the tz-free inverse of utctimetuple: no dependence
        # on the host timezone, unlike datetime.timestamp() on naives
        return (
            calendar.timegm(value.utctimetuple()) * 1_000_000
            + value.microsecond
        )
    if isinstance(value, _dt.date):
        return calendar.timegm(value.timetuple()) * 1_000_000
    # numpy.datetime64 / pandas.Timestamp without importing either:
    # both expose .to_pydatetime()/.astype — try the generic protocols
    to_py = getattr(value, "to_pydatetime", None)
    if to_py is not None:
        return _value_to_epoch_us(to_py())
    astype = getattr(value, "astype", None)
    if astype is not None:
        return int(value.astype("datetime64[us]").astype("int64"))
    raise TypeError(f"not a temporal value: {value!r}")


@dataclass(frozen=True)
class TemporalTransform:
    """Iceberg ``year``/``month``/``day``/``hour`` partition transform.

    Partition value = integral UTC offset since epoch at the chosen
    granularity (Iceberg's partition-value convention: 2024-03-05
    under ``day`` is 19787). Monotonic in the source value, so range
    predicates prune ordinally in bucket space; not range-expressible
    back into the value domain (months and years vary in width), so
    ``bucket_range`` is None and value-domain pruning falls to footer
    stats.
    """

    source_column: str
    granularity: str  # "year" | "month" | "day" | "hour"

    monotonic = True

    def apply_py(self, value) -> int:
        us = _value_to_epoch_us(value)
        days = us // 86_400_000_000
        if self.granularity == "hour":
            return us // 3_600_000_000
        if self.granularity == "day":
            return days
        d = _EPOCH_DATE + _dt.timedelta(days=days)
        if self.granularity == "month":
            return (d.year - 1970) * 12 + d.month - 1
        return d.year - 1970

    def apply_col(self, col: Column | str, dtype: str | None = None) -> Column:
        """Timezone-free Spark expression for the same bucket.

        ``unix_micros`` (exact long, no tz) for timestamps; ``datediff``
        against epoch for dates; raw value for epoch-µs longs. Calendar
        fields are then taken from a reconstructed DATE — ``F.year`` on
        a DATE is pure calendar arithmetic, where ``F.year`` on a
        TIMESTAMP would re-interpret under the session timezone and
        disagree with apply_py's UTC buckets."""
        c = F.col(col) if isinstance(col, str) else col
        if dtype == "date":
            days = F.datediff(c, F.to_date(F.lit("1970-01-01")))
            if self.granularity == "day":
                return days.cast("long")
            if self.granularity == "month":
                return ((F.year(c) - 1970) * 12 + F.month(c) - 1).cast("long")
            if self.granularity == "year":
                return (F.year(c) - 1970).cast("long")
            raise ValueError("hour() is not defined on a date column")
        if dtype in ("timestamp", "timestamp_ntz", None):
            us = F.unix_micros(c.cast("timestamp"))
        else:  # integral column already in engine epoch-µs convention
            us = c.cast("long")
        if self.granularity in _US_PER:
            per = _US_PER[self.granularity]
            return ((us - F.pmod(us, F.lit(per))) / F.lit(per)).cast("long")
        days = ((us - F.pmod(us, F.lit(86_400_000_000))) / F.lit(86_400_000_000)).cast(
            "int"
        )
        d = F.date_add(F.to_date(F.lit("1970-01-01")), days)
        if self.granularity == "month":
            return ((F.year(d) - 1970) * 12 + F.month(d) - 1).cast("long")
        return (F.year(d) - 1970).cast("long")

    def bucket_range(self, bucket: int) -> None:
        return None  # not value-range-expressible; prune in bucket space

    def bucket_start_us(self, bucket: int) -> int:
        """Epoch-µs of the bucket's inclusive lower boundary. Lets the
        pruner sharpen ``ts < V`` when V sits exactly ON a boundary
        (the canonical [start, end) time-range query): the end bucket
        then contains no matching value and is pruned too."""
        if self.granularity in _US_PER:
            return bucket * _US_PER[self.granularity]
        if self.granularity == "month":
            y, m = 1970 + bucket // 12, bucket % 12 + 1
            d = _dt.date(y, m, 1)
        else:
            d = _dt.date(1970 + bucket, 1, 1)
        return (d - _EPOCH_DATE).days * 86_400_000_000

    def may_contain(self, bucket: int, value) -> bool:
        try:
            return bucket == self.apply_py(value)
        except (TypeError, ValueError):
            return True  # unparseable predicate value: cannot prune

    def apply_arrow(self, col):
        """Executor-side Arrow bucketing: to_pylist yields datetime /
        date / int per the column's logical type — exactly the types
        apply_py accepts — so the loop shares one bucket definition
        with the Spark and planning paths. Per-task and parallel, same
        shape as BucketTransform.apply_arrow."""
        import pyarrow as pa

        return pa.array(
            (None if v is None else self.apply_py(v) for v in col.to_pylist()),
            type=pa.int64(),
        )

    def to_json(self) -> dict:
        return {
            "transform": self.granularity,
            "source_column": self.source_column,
        }

    @staticmethod
    def from_json(d: dict) -> "TemporalTransform":
        assert d["transform"] in ("year", "month", "day", "hour")
        return TemporalTransform(d["source_column"], d["transform"])


@dataclass(frozen=True)
class CompositeTransform:
    """Multi-field partition spec (Iceberg: a PartitionSpec with
    several fields, e.g. ``days(ts), bucket(16, id)`` — the layout
    real 100-TB event tables use; the reference's own spec is 1-D,
    ``Constants.java:33-35``, generalized here).

    Entries written under a composite spec carry a VALUE TUPLE in
    ``partition_fields`` (a JSON list, one integral bucket per field,
    in field order) instead of the scalar ``partition`` key; every
    pruning path resolves per-field — a predicate on any field's
    source column prunes on that field's bucket, and the surviving
    set is the INTERSECTION of each field's prunes, because a file's
    true value region is the intersection of its per-field buckets.

    Deliberately does NOT expose the single-field surface
    (``source_column`` / ``apply_py`` / ``apply_col`` /
    ``bucket_range`` / ``may_contain``): call sites that assume one
    field must isinstance-check first, so a missed audit site fails
    loudly (AttributeError) instead of silently pruning wrong."""

    fields: tuple  # tuple[Transform, ...], len >= 2

    monotonic = False

    @property
    def source_columns(self) -> tuple:
        return tuple(f.source_column for f in self.fields)

    def field_for(self, column: str):
        """(index, transform) of the FIRST field partitioning on
        ``column``, or (None, None). Case-insensitive like the SQL
        faces."""
        for i, f in enumerate(self.fields):
            if f.source_column.lower() == column.lower():
                return i, f
        return None, None

    def to_json(self) -> dict:
        return {
            "transform": "composite",
            "fields": [f.to_json() for f in self.fields],
        }

    @staticmethod
    def from_json(d: dict) -> "CompositeTransform":
        assert d["transform"] == "composite"
        return CompositeTransform(
            tuple(transform_from_json(f) for f in d["fields"])
        )


Transform = (
    TruncateTransform
    | IdentityTransform
    | BucketTransform
    | TemporalTransform
    | CompositeTransform
)

_KINDS = {
    "truncate": TruncateTransform,
    "identity": IdentityTransform,
    "bucket": BucketTransform,
    "composite": CompositeTransform,
    **{k: TemporalTransform for k in ("year", "month", "day", "hour")},
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
    if isinstance(t, CompositeTransform):
        if len(t.fields) < 2:
            raise ValueError(
                "composite partition spec needs at least two fields "
                "(a one-field list IS the single transform)"
            )
        if any(isinstance(f, CompositeTransform) for f in t.fields):
            raise ValueError("composite partition specs do not nest")
        seen = set()
        for f in t.fields:
            key = tuple(sorted(f.to_json().items()))
            if key in seen:
                raise ValueError(
                    f"duplicate partition field {f.to_json()} — each "
                    "(transform, column) pair may appear once"
                )
            seen.add(key)
            validate_transform(f, schema)
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
    elif isinstance(t, TemporalTransform):
        temporal = ds in ("timestamp", "timestamp_ntz", "date") or integral
        if not temporal:
            raise ValueError(
                f"{t.granularity}() needs a timestamp, date, or epoch-µs "
                f"integer column; {t.source_column!r} is {ds}"
            )
        if ds == "date" and t.granularity == "hour":
            raise ValueError("hour() is not defined on a date column")
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


def year(source_column: str) -> TemporalTransform:
    return TemporalTransform(source_column, "year")


def month(source_column: str) -> TemporalTransform:
    return TemporalTransform(source_column, "month")


def day(source_column: str) -> TemporalTransform:
    return TemporalTransform(source_column, "day")


def hour(source_column: str) -> TemporalTransform:
    return TemporalTransform(source_column, "hour")


def composite(*fields) -> CompositeTransform:
    """Multi-field partition spec: ``composite(day("ts"),
    bucket("id", 16))``. Validated against the schema at create /
    spec-evolution time like every transform."""
    return CompositeTransform(tuple(fields))
