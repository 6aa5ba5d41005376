"""PySpark-native analytics engine with the query/data-processing
capabilities of the reference `cccs-jc/java-iceberg-table` (a
high-frequency Iceberg ingestion/commit service), re-expressed
Spark-first.

Layout:
  session     SparkSession factory tuned for local[N] and cluster scale
  fixtures    loaders for the /root/testdata parquet tables
  queries/    the declared query surface (SURVEY.md §2.2 groups A-H)
  table/      lightweight Parquet+JSON-manifest table format
              (snapshot commits, fast append, partition pruning,
              metadata-only delete, snapshot expiry) — the reference's
              Iceberg capabilities, from scratch
  ingest/     writer / bookkeeper / reaper roles (reference Main.java)
  operators/  LLM-data-pipeline ops: dedup, similarity, text, multimodal
  streaming/  Structured Streaming surface
"""

__version__ = "0.1.0"
