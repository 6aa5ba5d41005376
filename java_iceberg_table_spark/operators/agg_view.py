"""Incrementally-maintained additive-aggregate view over an engine
table.

Count/sum aggregates are SELF-MAINTAINABLE: the view after a source
change equals the view before it plus a per-key delta that is
computable from the CHANGE alone (inserts add, deletes subtract —
the a3l change-feed row proves the CDC-signed form). This module
persists that idea as an engine TABLE, so the repeated join-aggregate
query (the c3 gate shape: fact ⋈ dims → grouped counts) reads a
≤ |group domain|-row table instead of re-scanning the fact side on
every execution. At 100 TB the fact scan is the whole query; the
maintained view makes reads O(result) and appends O(delta).

Contract: the caller supplies the per-key DELTA already aggregated
(keys + additive measure columns, same names as the view's). Signs
encode deletes (a CDC consumer sums +measure for inserts, -measure
for deletes, exactly a3l's fold). Non-additive aggregates (min/max,
distinct counts) are out of contract — they are not self-maintainable
under deletes and need their own operators (the engine's KMV sketch
covers mergeable NDV).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def additive_refresh(
    spark: SparkSession,
    mv_tbl,
    delta_agg: DataFrame,
    keys: list[str],
    extra_summary: dict | None = None,
    extra_summary_delete: dict | None = None,
    drop_when_zero: str | None = None,
) -> dict:
    """Fold a per-key additive delta into the maintained view table.

    Cost shape: one distinct over the delta's keys, one semi join of
    the view against them (view side ≤ one row per key), one
    sum-merge over (old rows ∪ delta rows) — all sized by the DELTA's
    key set. The commit is a metadata-only MOR equality delete of the
    touched keys plus one append (no data rewrite; a maintenance pass
    compacts on cadence).

    ``drop_when_zero`` names the COUNT measure: keys whose merged
    count reaches 0 leave the view entirely (a key all of whose source
    rows were deleted must not linger as a zero row — the recompute
    has no row for it). Views without a count column can't infer
    emptiness and keep zero-sum rows; pass the count column whenever
    the source takes deletes."""
    measure_cols = [c for c in delta_agg.columns if c not in keys]
    view_schema = {f.name: f.dataType for f in mv_tbl.schema().fields}
    delta_agg = delta_agg.persist()
    try:
        from functools import reduce

        from .topk_view import null_key_error

        touched = delta_agg.select(*keys).distinct().persist()
        any_null = reduce(
            lambda a, b: a | b, [F.col(k).isNull() for k in keys]
        )
        trow = touched.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(any_null.cast("int")).alias("nulls"),
        ).collect()[0]
        n_touched = trow["n"]
        if n_touched == 0:
            return {"touched_keys": 0, "view_rows_written": 0}
        if trow["nulls"]:
            raise null_key_error(keys, "additive_refresh")
        # runtime-filtered view read on the FIRST key + broadcast semi
        # join on the full key tuple: the fold reads only files whose
        # stats admit a touched key (effective once maintenance has
        # key-sorted the files) and the view side never shuffles.
        scanned, info = mv_tbl.scan_runtime_filtered(
            spark, touched, keys[0]
        )
        old = scanned.join(F.broadcast(touched), keys, "left_semi")
        merged = (
            old.unionByName(delta_agg.select(old.columns))
            .groupBy(*keys)
            .agg(
                *[
                    F.sum(c).cast(view_schema[c]).alias(c)
                    for c in measure_cols
                ]
            )
            .select(old.columns)
        )
        if drop_when_zero is not None:
            merged = merged.filter(F.col(drop_when_zero) != 0)
        rows = merged.persist().count()
        mv_tbl.delete_eq_mor(
            spark, touched, keys, extra_summary=extra_summary_delete
        )
        mv_tbl.append(merged, extra_summary=extra_summary)
        merged.unpersist()
        touched.unpersist()
        return {
            "touched_keys": n_touched,
            "view_rows_written": rows,
            "view_files_total": info["files_total"],
            "view_files_scanned": info["files_scanned"],
        }
    finally:
        delta_agg.unpersist()
