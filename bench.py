#!/usr/bin/env python
"""Benchmark driver (BASELINE.md plan): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Also reports the ingest-path KPIs the reference self-measures
(files/s committed, avg ingest latency, retention-delete wall time —
FileBasedBookkeeper.java:173-177, Reaper.java:25).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

HEADLINE = [
    "d1_tpch_q1",        # TPC-H Q1 shape (BASELINE gate)
    "c3_multiway_join",  # join-agg gate
    "e1_row_number_topk",  # window gate
    "b2_boolean_predicates",
    "d3_count_distinct",
    "f2_topk",
    "h3_top_tokens",
    "h6b_minhash_lsh_near_dup",
    "h8_ann_bruteforce_topk",
    "i3_tumbling_window_stream",
]


def bench_queries(spark, sf_dir: str) -> dict[str, float]:
    """Steady-state wall time per headline query: min of 2 runs (the
    first run of each query also pays one-off codegen/JIT)."""
    from java_iceberg_table_spark.queries import load_all

    registry = load_all()
    times: dict[str, float] = {}
    for name in HEADLINE:
        q = registry[name]
        runs = []
        # streaming ops once (availableNow machinery dominates, stable);
        # everything else min-of-2 so one-off codegen/JIT of the first
        # run doesn't masquerade as steady-state query cost
        n_runs = 1 if name.startswith("i") else 2
        for _ in range(n_runs):
            start = time.perf_counter()
            n = q.fn(spark, sf_dir).count()
            runs.append(time.perf_counter() - start)
            assert n >= 0
        times[name] = round(min(runs), 3)
    return times


def duckdb_reference(sf_dir: str) -> dict[str, float]:
    """DuckDB wall time for the BASELINE-gated queries (warm, min of 2)
    — recorded alongside so the 2x-of-DuckDB gate is auditable."""
    import duckdb

    from java_iceberg_table_spark.oracle import duck_connect
    from java_iceberg_table_spark.queries import load_all

    registry = load_all()
    con = duck_connect(sf_dir)
    out = {}
    for name in ["d1_tpch_q1", "c3_multiway_join", "e1_row_number_topk"]:
        sql = registry[name].oracle
        runs = []
        for _ in range(2):
            t0 = time.perf_counter()
            con.execute(sql).fetchall()
            runs.append(time.perf_counter() - t0)
        out[name] = round(min(runs), 3)
    con.close()
    return out


def bench_ingest(spark) -> dict[str, float]:
    """Decoupled-ingestion KPI: writers stream files + monikers, one
    bookkeeper batch-commits them (the reference's headline metric)."""
    from java_iceberg_table_spark.ingest.bookkeeper import Bookkeeper
    from java_iceberg_table_spark.ingest.writer import Writer
    from java_iceberg_table_spark.table import create_table, truncate
    from pyspark.sql.types import (
        BinaryType,
        LongType,
        StringType,
        StructField,
        StructType,
        TimestampType,
    )

    WIDTH = 300_000_000
    root = tempfile.mkdtemp(prefix="bench_ingest_") + "/t"
    schema = StructType(
        [
            StructField("message_id", LongType(), False),
            StructField("data", StringType(), True),
            StructField("timestamp", TimestampType(), True),
            StructField("timeperiod_loadedBy", LongType(), True),
            StructField("message_body", BinaryType(), True),
        ]
    )
    try:
        tbl = create_table(root, schema, partition=truncate("timeperiod_loadedBy", WIDTH))
        writers = [Writer(tbl, writer_id=i, seed=42 + i) for i in range(5)]  # run.sh fan-out
        n_files, rows = 20, 100
        t0 = time.perf_counter()
        for w in writers:
            w.run_iteration(n_files=n_files, rows_per_file=rows, timeperiod_us=0)
        write_s = time.perf_counter() - t0
        bk = Bookkeeper(tbl, batch_cap=500)
        t1 = time.perf_counter()
        m = bk.run_once()
        commit_s = time.perf_counter() - t1
        t2 = time.perf_counter()
        tbl.delete_where("timeperiod_loadedBy", "<", 0)  # no-op aligned delete
        retention_s = time.perf_counter() - t2
        total_files = 5 * n_files
        return {
            "ingest_files_per_sec": round(total_files / (write_s + commit_s), 1),
            "commit_sec_per_batch": round(commit_s, 3),
            "avg_ingest_latency_ms": round(m["avg_latency_ms"], 1),
            "retention_delete_sec": round(retention_s, 4),
        }
    finally:
        shutil.rmtree(os.path.dirname(root), ignore_errors=True)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", "") or 0.1)
    from java_iceberg_table_spark.session import get_spark

    # local-bench session: AQE on; 8 shuffle partitions — at sf0.1 a
    # shuffle holds <100 MB, so 8 partitions keeps every stage's task-
    # setup overhead bounded while AQE would coalesce further anyway.
    # (Cluster deployments size this via config; see session.py.)
    spark = get_spark(app_name="bench", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    # JVM/codegen warmup so measurements reflect steady state, not
    # first-query JIT + classloading
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    from java_iceberg_table_spark.fixtures import load_table

    load_table(spark, sf_dir, "lineitem").limit(1).collect()
    t0 = time.perf_counter()
    queries = bench_queries(spark, sf_dir)
    ingest = bench_ingest(spark)
    duck = duckdb_reference(sf_dir)
    total = round(time.perf_counter() - t0, 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall",
                "value": round(sum(queries.values()), 3),
                "unit": "sec",
                "queries": queries,
                "ingest": ingest,
                "duckdb_reference": duck,
                "total_bench_sec": total,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
