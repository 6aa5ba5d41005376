"""Incrementally-maintained top-k view over an engine table.

The window gate query (row_number ≤ k per key) is the canonical
"repeated query over slowly-growing data": recomputing the full
window on every read re-sorts the entire table, which at 100 TB is
exactly the plan you must NOT run twice. The warehouse answer is a
materialized top-k VIEW maintained at write time:

- the view table stores ``(part_key, payload..., rn)`` — at most k
  rows per key, rank already materialized;
- each append of a source delta folds in with work proportional to
  the DELTA, not the table: only keys present in the delta are
  touched, and their candidate set is (old top-k) ∪ (delta rows) —
  for insert-only sources the new top-k is always a subset of that
  union (a row displaced out of the top-k can never return without
  source deletes);
- the fold commits as one MOR equality delete (metadata-only; the
  touched keys' old rows masked at read time) plus one append — no
  data-file rewrite, the same commit shape as the engine's other
  row-level ops;
- reads are then a pure scan of ≤ k·keys rows with NO window, NO
  shuffle and NO sort beyond the final presentation order.

Source DELETES are out of contract (like any insert-only maintained
aggregate): a delete can promote a row the view no longer holds, so
affected keys must be recomputed from source (or the view kept with a
buffer k' > k). The fold refuses nothing — callers owning delete
paths route affected keys through ``rebuild_keys``.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def null_key_error(keys: list[str], op: str) -> ValueError:
    return ValueError(
        f"{op}: NULL values in key column(s) {keys} are out of "
        "contract — equality deletes and semi joins never match "
        "NULL, so the fold would duplicate the NULL group's view "
        "rows; filter NULL keys (or map them to a sentinel) "
        "before folding"
    )


def refuse_null_keys(touched: DataFrame, keys: list[str], op: str) -> None:
    """NULL partition keys break the fold invariant everywhere a fold
    replaces touched keys: the broadcast left-semi join and the MOR
    equality delete both use null-rejecting equality, so a NULL-keyed
    group's OLD view rows are never matched (not read as candidates,
    not deleted) while the fold still APPENDS a fresh NULL-group
    result — duplicate view rows accumulate for the NULL key on every
    fold. Refuse loudly at fold entry, matching the operators' other
    loud-refusal contracts (e.g. topk_view_sink's insert-only check);
    callers with NULL-keyed data filter or bucket NULLs explicitly."""
    cond = reduce(lambda a, b: a | b, [F.col(k).isNull() for k in keys])
    if not touched.filter(cond).isEmpty():
        raise null_key_error(keys, op)


def topk_frame(
    df: DataFrame, part_key: str, order_cols: list[str], k: int
) -> DataFrame:
    """Full top-k computation (the view's initial build, and the
    per-touched-key recompute inside a fold): row_number over
    (part_key; order_cols) kept ≤ k, rank materialized as ``rn``.
    Map-side WindowGroupLimit ships ≤ k rows per key per mapper."""
    w = Window.partitionBy(part_key).orderBy(*order_cols)
    return (
        df.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
    )


def topk_refresh(
    spark: SparkSession,
    mv_tbl,
    delta_df: DataFrame,
    part_key: str,
    order_cols: list[str],
    k: int,
    extra_summary: dict | None = None,
    extra_summary_delete: dict | None = None,
) -> dict:
    """Fold one insert-only source delta into the maintained view
    table ``mv_tbl`` (an engine Table whose schema is the delta's
    columns + ``rn``). Returns fold stats.

    Cost shape: one distinct over the delta's keys, one semi join of
    the view against those keys (view side is ≤ k rows/key), one
    window over (old top-k ∪ delta) — every stage is sized by the
    DELTA and its touched keys, never by the source table. The
    commit is metadata-only (equality delete) + append."""
    delta_df = delta_df.persist()
    try:
        touched = delta_df.select(part_key).distinct().persist()
        # count and NULL-check in ONE action (a separate isEmpty probe
        # would cost an extra job per fold — round-10 review)
        trow = touched.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(part_key).isNull().cast("int")).alias("nulls"),
        ).collect()[0]
        n_touched = trow["n"]
        if n_touched == 0:
            return {"touched_keys": 0, "view_rows_written": 0}
        if trow["nulls"]:
            raise null_key_error([part_key], "topk_refresh")
        # runtime-filtered view read: the fold must NOT scan the whole
        # view at 100 TB — file stats prune to the files that can hold
        # a touched key (effective once maintenance has key-sorted the
        # files), and the broadcast semi join keeps the view side
        # shuffle-free; the view never moves through an exchange.
        scanned, info = mv_tbl.scan_runtime_filtered(
            spark, touched, part_key
        )
        old = (
            scanned
            .join(F.broadcast(touched), part_key, "left_semi")
            .drop("rn")
        )
        cand = old.unionByName(delta_df.select(old.columns))
        new_top = topk_frame(cand, part_key, order_cols, k).select(
            *old.columns, "rn"
        )
        rows = new_top.persist().count()
        mv_tbl.delete_eq_mor(
            spark, touched, [part_key], extra_summary=extra_summary_delete
        )
        mv_tbl.append(new_top, extra_summary=extra_summary)
        new_top.unpersist()
        touched.unpersist()
        return {
            "touched_keys": n_touched,
            "view_rows_written": rows,
            "view_files_total": info["files_total"],
            "view_files_scanned": info["files_scanned"],
        }
    finally:
        delta_df.unpersist()


def rebuild_keys(
    spark: SparkSession,
    mv_tbl,
    source_df: DataFrame,
    keys_df: DataFrame,
    part_key: str,
    order_cols: list[str],
    k: int,
    extra_summary: dict | None = None,
    extra_summary_delete: dict | None = None,
) -> dict:
    """Recompute the view for an explicit key set from SOURCE data —
    the delete-path escape hatch. Work is O(source rows of those
    keys), still never O(table) when the source is key-partitioned."""
    keys = keys_df.select(part_key).distinct().persist()
    krow = keys.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(part_key).isNull().cast("int")).alias("nulls"),
    ).collect()[0]
    n = krow["n"]
    if krow["nulls"]:
        raise null_key_error([part_key], "rebuild_keys")
    src = source_df.join(keys, part_key, "left_semi")
    new_top = topk_frame(src, part_key, order_cols, k)
    rows = new_top.persist().count()
    mv_tbl.delete_eq_mor(
        spark, keys, [part_key], extra_summary=extra_summary_delete
    )
    mv_tbl.append(
        new_top.select(*[c for c in new_top.columns]),
        extra_summary=extra_summary,
    )
    new_top.unpersist()
    keys.unpersist()
    return {"touched_keys": n, "view_rows_written": rows}
