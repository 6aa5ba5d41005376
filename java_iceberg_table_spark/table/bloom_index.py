"""Manifest-level Bloom-filter file skipping for point lookups.

Min/max footer stats (table/stats.py) prune RANGE predicates, but a
point lookup on a column whose values are hash-distributed across
files (any non-sort column) matches every file's [min, max] and scans
the whole table. A per-file Bloom filter in the manifest entry closes
that gap: ``plan_files`` rules out every file whose filter proves the
key absent — no parquet footer is even opened, the decision is made
from manifest metadata alone (one step earlier than parquet's own
row-group bloom filters, which require touching each file).

Design:
- built DISTRIBUTED, per data file, in one Spark job per append: read
  back the written files with ``_metadata.file_path``, hash each value
  k ways, explode to (file, word, bit) and ``bit_or``-aggregate — the
  only thing collected is the finished filters (manifest-scale).
- per-file sizing: ``bits = next_pow2(rows * bits_per_key)`` with
  bits_per_key=10, k=7 → ~1% false positives regardless of file size.
- hash = CRC32 over a seeded string rendering of the value. CRC32 is
  the one hash that is bit-identical between a Spark expression
  (``F.crc32``) and the Python standard library (``zlib.crc32``), so
  the build side (executors) and the probe side (driver planning)
  need no shared native library.
- probes are conservative: a file with no bloom for the column, or a
  predicate other than equality, falls back to min/max semantics.
"""

from __future__ import annotations

import re
import zlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BITS_PER_KEY = 10
NUM_HASHES = 7
_SEED_FMT = "bloomseed{i}:"


def _rel_key(p: str) -> str:
    """Root-relative ``data/...`` key for a file path — the same key
    ``table._file_key_col`` extracts on the scan side. Basenames are
    NOT usable: a partitioned append emits the same part-file name
    into every partition directory, and basename-keyed builds would
    merge those files' value sets into one oversized shared bloom
    (never a false negative, but prunes less than sized for).
    Falls back to the basename only for paths outside a data/ root
    (direct test harness calls).

    The greedy ``^.*/`` prefix anchors the LAST ``/data/`` segment —
    exactly what the Spark-side ``regexp_extract(^.*/(data/.+)$)``
    mirror extracts. ``re.search(r"/(data/.+)$")`` would anchor the
    FIRST ``/data/``; for a table rooted under a path that itself
    contains a ``data`` component (e.g. ``/data/warehouse/t``) the
    build keys and scan keys would then disagree and every probe
    would see an all-zero bloom (silent missing rows)."""
    m = re.match(r"^.*/(data/.+)$", p)
    return m.group(1) if m else p.rsplit("/", 1)[-1]


def _rel_key_col():
    """Spark-side mirror of ``_rel_key`` over ``_metadata.file_path``."""
    ext = F.regexp_extract(F.col("_metadata.file_path"), r"^.*/(data/.+)$", 1)
    base = F.element_at(F.split(F.col("_metadata.file_path"), "/"), -1)
    return F.when(ext == "", base).otherwise(ext)


def _next_pow2(n: int) -> int:
    p = 1024
    while p < n:
        p <<= 1
    return p


def sized_bits(rows: int) -> int:
    return _next_pow2(max(1, rows) * BITS_PER_KEY)


def build_file_blooms(
    spark: SparkSession,
    file_rows: dict[str, int],
    column: str,
) -> dict[str, dict]:
    """One Spark job: per-file Bloom filters over ``column`` for every
    (absolute path -> row count) in ``file_rows``. Returns
    {abs_path: {"column", "bits", "k", "words": [int64 × bits/64]}}.

    The per-file bit width is keyed into the plan as a literal map
    (path basename -> bits), so files of different sizes get
    right-sized filters in the same job."""
    paths = sorted(file_rows)
    base_bits = {_rel_key(p): sized_bits(file_rows[p]) for p in paths}
    bits_map = F.create_map(
        *[F.lit(x) for kv in base_bits.items() for x in kv]
    )
    df = (
        spark.read.parquet(*paths)
        .select(
            F.col(column).cast("string").alias("__v"),
            _rel_key_col().alias("__f"),
        )
        .filter(F.col("__v").isNotNull())
        .withColumn("__bits", F.element_at(bits_map, F.col("__f")))
    )
    pos = F.array(
        *[
            F.pmod(
                F.crc32(F.concat(F.lit(_SEED_FMT.format(i=i)), F.col("__v")).cast("binary")),
                F.col("__bits"),
            )
            for i in range(NUM_HASHES)
        ]
    )
    words = (
        df.select("__f", F.explode(pos).alias("__p"))
        .select(
            "__f",
            (F.col("__p") / 64).cast("long").alias("__w"),
            # F.shiftleft only takes a literal count; the per-row shift
            # needs the SQL form
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(__p % 64 AS INT))").alias(
                "__m"
            ),
        )
        .groupBy("__f", "__w")
        .agg(F.bit_or("__m").alias("__word"))
        .collect()
    )
    by_file: dict[str, dict[int, int]] = {}
    for r in words:
        by_file.setdefault(r["__f"], {})[int(r["__w"])] = int(r["__word"])
    out: dict[str, dict] = {}
    for p in paths:
        base = _rel_key(p)
        bits = base_bits[base]
        dense = [0] * (bits // 64)
        for w, v in by_file.get(base, {}).items():
            dense[w] = v
        out[p] = {
            "column": column,
            "bits": bits,
            "k": NUM_HASHES,
            "words": dense,
        }
    return out


def bloom_may_contain(bloom: dict, value: object) -> bool:
    """Driver-side probe, hash-identical to the Spark build side."""
    bits = int(bloom["bits"])
    words = bloom["words"]
    s = str(value)
    for i in range(int(bloom["k"])):
        h = zlib.crc32((_SEED_FMT.format(i=i) + s).encode("utf-8"))
        p = h % bits
        # words carry Spark's SIGNED longs; Python's & applies two's-
        # complement semantics to negative ints, so masking is exact
        if not int(words[p // 64]) & (1 << (p % 64)):
            return False
    return True


def build_file_token_blooms(
    spark: SparkSession,
    paths: list[str],
    column: str,
) -> dict[str, dict]:
    """Per-file Bloom filters over the DISTINCT whitespace TOKENS of a
    text column — keyword-search file skipping for document corpora: a
    `text has-token w` lookup rules out every file whose filter proves
    the token absent, from manifest metadata alone. Two small Spark
    jobs per append: one distinct-token count per file (exact sizing —
    token cardinality is not derivable from row counts), one
    hash+bit_or build. Same CRC32 build/probe parity contract as the
    value blooms above; probe via ``bloom_may_contain``."""
    toks = (
        spark.read.parquet(*paths)
        .select(
            F.explode(F.split(F.col(column), "\\s+")).alias("__t"),
            _rel_key_col().alias("__f"),
        )
        .filter(F.col("__t") != "")
        .distinct()
    )
    toks = toks.persist()
    try:
        counts = {
            r["__f"]: r["n"]
            for r in toks.groupBy("__f").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        base_bits = {f: sized_bits(n) for f, n in counts.items()}
        bits_map = F.create_map(
            *[F.lit(x) for kv in base_bits.items() for x in kv]
        )
        df = toks.withColumn("__bits", F.element_at(bits_map, F.col("__f")))
        pos = F.array(
            *[
                F.pmod(
                    F.crc32(
                        F.concat(F.lit(_SEED_FMT.format(i=i)), F.col("__t")).cast(
                            "binary"
                        )
                    ),
                    F.col("__bits"),
                )
                for i in range(NUM_HASHES)
            ]
        )
        words = (
            df.select("__f", F.explode(pos).alias("__p"))
            .select(
                "__f",
                (F.col("__p") / 64).cast("long").alias("__w"),
                F.expr(
                    "shiftleft(CAST(1 AS BIGINT), CAST(__p % 64 AS INT))"
                ).alias("__m"),
            )
            .groupBy("__f", "__w")
            .agg(F.bit_or("__m").alias("__word"))
            .collect()
        )
    finally:
        toks.unpersist()
    by_file: dict[str, dict[int, int]] = {}
    for r in words:
        by_file.setdefault(r["__f"], {})[int(r["__w"])] = int(r["__word"])
    out: dict[str, dict] = {}
    for p in paths:
        base = _rel_key(p)
        if base not in base_bits:
            continue  # file had no tokens
        bits = base_bits[base]
        dense = [0] * (bits // 64)
        for w, v in by_file.get(base, {}).items():
            dense[w] = v
        out[p] = {
            "column": column,
            "bits": bits,
            "k": NUM_HASHES,
            "words": dense,
        }
    return out
