"""Group A — scans, sources, sinks (SURVEY.md §2.2 A).

Scale notes: A1/A2/A4 are pure scan shapes — Catalyst pushes the
filter and projection into the parquet reader, so at 100 TB the read
is bounded by the referenced columns and surviving row groups, not
table size. A5/A6 are sink/source round-trips: the re-read count is
oracle-checked against the source table, which validates the sink
without a Python-side diff.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..fixtures import load_table
from . import register


@register("a1_parquet_scan_count", oracle="SELECT COUNT(*) AS cnt FROM lineitem", group="A")
def a1_parquet_scan_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("cnt"))


@register(
    "a2_projection_pushdown",
    oracle="""
SELECT l_orderkey, l_quantity
FROM lineitem
ORDER BY l_orderkey, l_linenumber, l_extendedprice, l_partkey, l_suppkey
LIMIT 100
""",
    group="A",
)
def a2_projection_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-column projection; ReadSchema in the plan must show only the
    three referenced columns (pruning verified in test_plans)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.orderBy("l_orderkey", "l_linenumber", "l_extendedprice", "l_partkey", "l_suppkey")
        .select("l_orderkey", "l_quantity")
        .limit(100)
    )


@register(
    "a4_time_filtered_scan",
    oracle="""
SELECT COUNT(*) AS cnt FROM events
WHERE ts >= TIMESTAMP '2024-01-02 00:00:00'
""",
    group="A",
)
def a4_time_filtered_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-predicate scan — the shape partition pruning serves in the
    engine table layer (manifest pruning covered in table/ tests)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.filter(F.col("ts") >= F.lit("2024-01-02 00:00:00").cast("timestamp")).agg(
        F.count(F.lit(1)).alias("cnt")
    )


@register(
    "a5_parquet_sink_roundtrip",
    oracle="SELECT COUNT(*) AS cnt FROM orders WHERE o_totalprice > 100000",
    group="A",
)
def a5_parquet_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write a filtered table to parquet, re-read, count. The oracle
    checks the round-tripped count against the source table."""
    out = tempfile.mkdtemp(prefix="sink_parquet_")
    try:
        orders = load_table(spark, sf_dir, "orders")
        (
            orders.filter(F.col("o_totalprice") > 100000)
            .repartition(4)
            .write.mode("overwrite")
            .parquet(os.path.join(out, "t"))
        )
        back = spark.read.parquet(os.path.join(out, "t"))
        # materialize the count before the temp dir can be cleaned
        cnt = back.count()
        return spark.createDataFrame([(cnt,)], "cnt bigint")
    finally:
        shutil.rmtree(out, ignore_errors=True)


@register(
    "a6_csv_json_source",
    oracle="""
SELECT COUNT(*) AS cnt, SUM(n_chars)::BIGINT AS sum_chars FROM documents
""",
    group="A",
)
def a6_csv_json_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink+source round-trip: documents -> csv -> read with explicit
    schema -> aggregate; oracle checks against the original table."""
    out = tempfile.mkdtemp(prefix="sink_csv_")
    try:
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
        docs.write.mode("overwrite").option("header", True).csv(os.path.join(out, "t"))
        back = spark.read.option("header", True).schema("doc_id bigint, lang string, n_chars bigint").csv(
            os.path.join(out, "t")
        )
        row = back.agg(
            F.count(F.lit(1)).alias("cnt"), F.sum("n_chars").alias("sum_chars")
        ).collect()[0]
        return spark.createDataFrame([(row["cnt"], row["sum_chars"])], "cnt bigint, sum_chars bigint")
    finally:
        shutil.rmtree(out, ignore_errors=True)


@register(
    "a6c_orc_source",
    oracle="""
SELECT source, COUNT(*) AS cnt, SUM(n_chars)::BIGINT AS sum_chars
FROM documents GROUP BY source ORDER BY source
""",
    group="A",
)
def a6c_orc_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC sink+source round-trip (native Spark ORC; columnar with
    predicate pushdown like parquet). Completes the format matrix:
    Parquet / CSV / JSON / ORC; Avro is documented out (no spark-avro
    module offline — reference's R5 toggle, SURVEY \u00a72.1)."""
    out = tempfile.mkdtemp(prefix="sink_orc_")
    try:
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
        docs.write.mode("overwrite").orc(os.path.join(out, "t"))
        back = spark.read.orc(os.path.join(out, "t"))
        rows = (
            back.groupBy("source")
            .agg(F.count(F.lit(1)).alias("cnt"), F.sum("n_chars").alias("sum_chars"))
            .orderBy("source")
            .collect()
        )
        return spark.createDataFrame(rows, "source string, cnt bigint, sum_chars bigint")
    finally:
        shutil.rmtree(out, ignore_errors=True)


@register(
    "a6d_avro_source",
    oracle="""
SELECT lang, COUNT(*) AS cnt, SUM(n_chars)::BIGINT AS sum_chars
FROM documents GROUP BY lang ORDER BY lang
""",
    group="A",
)
def a6d_avro_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Avro sink+source round-trip (R5 toggle, Constants.java:16):
    documents slice -> Avro OCF written executor-side via mapInPandas
    (sources/avro_io.write_avro_df — spark-avro is absent offline; the
    codec is a from-scratch implementation of the public spec) ->
    distributed re-read (binaryFile + mapInPandas) -> aggregate. Data
    never crosses the driver in either direction; only the file
    manifest does. The oracle checks the round trip against the
    source table."""
    from ..sources.avro_io import read_avro_df, write_avro_df

    out = tempfile.mkdtemp(prefix="sink_avro_")
    try:
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
        # the multi-file layout a real ingest produces: one OCF per
        # partition, written where the partition lives
        paths = write_avro_df(docs.repartition(4, "doc_id"), out)
        back = read_avro_df(spark, paths, docs.schema)
        rows = (
            back.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("cnt"), F.sum("n_chars").alias("sum_chars"))
            .orderBy("lang")
            .collect()
        )
        return spark.createDataFrame(rows, "lang string, cnt bigint, sum_chars bigint")
    finally:
        shutil.rmtree(out, ignore_errors=True)


@register(
    "a6b_json_source",
    oracle="""
SELECT lang, COUNT(*) AS cnt, SUM(n_chars)::BIGINT AS sum_chars
FROM documents GROUP BY lang ORDER BY lang
""",
    group="A",
)
def a6b_json_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines sink+source round-trip with explicit read schema."""
    out = tempfile.mkdtemp(prefix="sink_json_")
    try:
        docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
        docs.write.mode("overwrite").json(os.path.join(out, "t"))
        back = spark.read.schema("doc_id bigint, lang string, n_chars bigint").json(
            os.path.join(out, "t")
        )
        rows = (
            back.groupBy("lang")
            .agg(F.count(F.lit(1)).alias("cnt"), F.sum("n_chars").alias("sum_chars"))
            .orderBy("lang")
            .collect()
        )
        return spark.createDataFrame(
            [(r["lang"], r["cnt"], r["sum_chars"]) for r in rows],
            "lang string, cnt bigint, sum_chars bigint",
        )
    finally:
        shutil.rmtree(out, ignore_errors=True)


@register(
    "a7_bucketed_colocated_join",
    oracle="""
SELECT COUNT(*)::BIGINT AS cnt,
       SUM(l_quantity)::DOUBLE AS sum_qty
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
""",
    group="A",
)
def a7_bucketed_colocated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join with NO shuffle: both tables are written
    bucketed (+ sorted) on the join key, so the sort-merge join reads
    bucket i of one table against bucket i of the other directly —
    the plan has no Exchange on either join input (gated in
    test_plans.py). This is the layout move that makes a repeated
    100 TB fact-fact join affordable: the shuffle is paid ONCE at
    write time and amortized over every subsequent join, instead of
    re-shuffling both tables per query. The merge hint only pins the
    strategy at fixture scale (where the optimizer would rather
    broadcast the small side); at production scale SMJ is what the
    optimizer picks anyway.
    """
    from ..streaming.jobs import shared_staged

    sfx = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    db = f"bucketdb_{sfx}"

    def stage() -> str:
        loc = tempfile.mkdtemp(prefix="bucket_")
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {db} LOCATION '{loc}'")
        (
            load_table(spark, sf_dir, "orders")
            .select("o_orderkey", "o_totalprice")
            .write.bucketBy(8, "o_orderkey")
            .sortBy("o_orderkey")
            .mode("overwrite")
            .saveAsTable(f"{db}.orders_b")
        )
        (
            load_table(spark, sf_dir, "lineitem")
            .select("l_orderkey", "l_quantity")
            .write.bucketBy(8, "l_orderkey")
            .sortBy("l_orderkey")
            .mode("overwrite")
            .saveAsTable(f"{db}.lineitem_b")
        )
        return loc

    shared_staged(("bucketed", sf_dir, db), stage)
    o = spark.table(f"{db}.orders_b").hint("merge")
    l = spark.table(f"{db}.lineitem_b").hint("merge")
    return o.join(l, o.o_orderkey == l.l_orderkey).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("l_quantity").cast("double").alias("sum_qty"),
    )
