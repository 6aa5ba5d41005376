"""CLI role dispatcher — the reference's Main.java:18-101 surface,
so an operator of the reference can run the same roles here:

    python -m java_iceberg_table_spark.cli create  <table> [--width US]
    python -m java_iceberg_table_spark.cli writers <table> --iterations N --files F --rows R [--writer-id K]
    python -m java_iceberg_table_spark.cli writeandcommitfiles <table> --iterations N --files F --rows R
    python -m java_iceberg_table_spark.cli bookkeeper <table> --iterations N [--sleep-ms MS] [--retention-ms MS]
    python -m java_iceberg_table_spark.cli bookkeeper2 <table> --messages-file PATH
    python -m java_iceberg_table_spark.cli reaper <table> --iterations N [--max-age-ms MS] [--retain-last K]
    python -m java_iceberg_table_spark.cli clean  <table>
    python -m java_iceberg_table_spark.cli history <table>
    python -m java_iceberg_table_spark.cli sql <catalog_root> --statement "DELETE FROM t WHERE ..."

Writers/bookkeeper are separate OS processes against one table dir,
exactly like the reference's 5-JVM fan-out (run.sh:36-46); commit
safety comes from the table layer's CAS, not from this CLI.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

WIDTH_US_DEFAULT = 300_000_000  # 5 min (Constants.java:25)

EVENTS_SPARK_SCHEMA = StructType(
    [
        StructField("message_id", LongType(), False),
        StructField("data", StringType(), True),
        StructField("timestamp", TimestampType(), True),
        StructField("timeperiod_loadedBy", LongType(), True),
        StructField("message_body", BinaryType(), True),
    ]
)


def _now_us() -> int:
    return int(time.time() * 1_000_000)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="java_iceberg_table_spark")
    p.add_argument("role", choices=[
        "create", "writers", "writeandcommitfiles", "bookkeeper",
        "bookkeeper2", "reaper", "clean", "history", "sql",
    ])
    p.add_argument("table")
    p.add_argument("--width", type=int, default=WIDTH_US_DEFAULT)
    p.add_argument("--iterations", type=int, default=1)
    p.add_argument("--files", type=int, default=2)
    p.add_argument("--rows", type=int, default=100)
    p.add_argument("--writer-id", type=int, default=0)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--sleep-ms", type=int, default=0)
    p.add_argument("--retention-ms", type=int, default=None)
    p.add_argument("--max-age-ms", type=int, default=10 * 60 * 1000)
    p.add_argument("--retain-last", type=int, default=20)
    p.add_argument("--messages-file", default=None)
    p.add_argument("--statement", default=None)
    args = p.parse_args(argv)

    from .table import create_table, load_table, truncate

    if args.role == "sql":
        # <table> positional is the CATALOG root here. DML routes
        # through Catalog.sql (write side); SELECTs run over pinned
        # views (read side) and print JSON lines.
        from .session import get_spark
        from .table import Catalog
        from .table.sql_dml import UnsupportedSQL

        if not args.statement:
            print("--statement required for sql role", file=sys.stderr)
            return 2
        spark = get_spark(app_name="engine-sql")
        spark.sparkContext.setLogLevel("ERROR")
        cat = Catalog(args.table)
        head = args.statement.strip().split(None, 1)[0].upper()
        if head == "SELECT":
            cat.register_views(spark)
            for row in spark.sql(args.statement).collect():
                print(json.dumps(row.asDict(), default=str))
            return 0
        try:
            print(json.dumps(cat.sql(spark, args.statement)))
            return 0
        except UnsupportedSQL as ex:
            print(json.dumps({"error": str(ex)}), file=sys.stderr)
            return 2

    if args.role == "create":
        create_table(
            args.table,
            EVENTS_SPARK_SCHEMA,
            partition=truncate("timeperiod_loadedBy", args.width),
        )
        print(json.dumps({"created": args.table, "width_us": args.width}))
        return 0

    tbl = load_table(args.table)

    if args.role == "clean":
        tbl.drop()
        print(json.dumps({"dropped": args.table}))
        return 0

    if args.role == "history":
        print(json.dumps(tbl.history(), indent=2, default=str))
        return 0

    if args.role in ("writers", "writeandcommitfiles"):
        from .ingest.writer import Writer

        w = Writer(tbl, writer_id=args.writer_id, seed=args.seed)
        for it in range(args.iterations):
            tp = (_now_us() // args.width) * args.width
            t0 = time.perf_counter()
            if args.role == "writers":
                w.run_iteration(args.files, args.rows, tp)
            else:
                w.write_and_commit(args.files, args.rows, tp)
            print(
                json.dumps(
                    {
                        "iteration": it,
                        "files": args.files,
                        "rows": args.files * args.rows,
                        "took_ms": round((time.perf_counter() - t0) * 1000, 1),
                    }
                )
            )
            if args.sleep_ms:
                time.sleep(args.sleep_ms / 1000)
        return 0

    if args.role == "bookkeeper":
        from .ingest.bookkeeper import Bookkeeper

        bk = Bookkeeper(tbl)
        totals = bk.run_loop(
            args.iterations,
            sleep_s=args.sleep_ms / 1000,
            retention_us=args.retention_ms * 1000 if args.retention_ms else None,
        )
        print(json.dumps(totals | {"avg_latency_ms": round(bk.total_latency_ms / max(1, bk.total_files_appended), 2)}))
        return 0

    if args.role == "bookkeeper2":
        from .ingest.queue_bookkeeper import QueueBookkeeper
        from .session import get_spark

        spark = get_spark(app_name="bookkeeper2")
        spark.sparkContext.setLogLevel("ERROR")
        with open(args.messages_file) as f:
            msgs = [line.strip() for line in f if line.strip()]
        raw = spark.createDataFrame([(m,) for m in msgs], "message string")
        qb = QueueBookkeeper(tbl)
        print(json.dumps(qb.process_messages(raw)))
        return 0

    if args.role == "reaper":
        from .ingest.reaper import Reaper

        r = Reaper(tbl, max_age_ms=args.max_age_ms, retain_last=args.retain_last)
        for it in range(args.iterations):
            stats = r.run_once()
            print(json.dumps({"iteration": it} | stats))
            if args.sleep_ms:
                time.sleep(args.sleep_ms / 1000)
        return 0

    return 1


if __name__ == "__main__":
    sys.exit(main())
