"""Maintained views as CATALOG objects: the fold operators
(operators/topk_view.py, operators/agg_view.py) bound to catalog
tables with a CDC-cursor refresh — the engine-level shape of the
Iceberg materialized-view direction (a storage table + freshness
lineage back to the source).

Design:
- the view IS an engine table in the catalog; its definition lives in
  its own TABLE PROPERTIES (``mv.kind`` = topk | agg, ``mv.source``,
  ``mv.key``, ``mv.order``, ``mv.k``, ``mv.value``) — no new catalog
  state shape, time travel and concurrency come for free;
- freshness is a SOURCE-SNAPSHOT CURSOR stamped commit-atomically in
  each refresh's append summary (``mv-source-cursor``), read back via
  the live lineage exactly like the streaming folds' batch watermarks
  — an externally rolled-back refresh is not counted, a replayed
  refresh is a no-op;
- ``refresh`` reads the source's row-level CHANGE FEED since the
  cursor (``changes_between`` — O(changed files), not O(table)) and
  folds it: additive views take delete-signed deltas directly; top-k
  views fold inserts incrementally and REBUILD the delete-touched
  keys from source (the only correct delete path without a k-buffer);
- both table commits (the fold's delete+append) and the catalog pin
  publish happen per refresh, so catalog readers move atomically from
  one consistent (source-version, view-content) pair to the next.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.agg_view import additive_refresh
from ..operators.topk_view import rebuild_keys, topk_frame, topk_refresh
from .table import Table


def _sum_cast(dtype) -> str:
    """Fold type for a SUM measure: integral columns fold as LONG
    (exact for any aggregate ≤ int64 — a 100-TB integral-cents source
    summed as double silently loses exactness past 2^53), everything
    else as double. Decided ONCE at view creation from the SOURCE
    column's dtype and stored as the view's measure column type;
    every later fold (refresh delta, realtime tail, full rebuild,
    streaming sink) reads the type back from the VIEW's schema, so
    pre-existing double views keep folding as double."""
    from pyspark.sql.types import (
        ByteType,
        IntegerType,
        LongType,
        ShortType,
    )

    return (
        "long"
        if isinstance(dtype, (ByteType, ShortType, IntegerType, LongType))
        else "double"
    )


def _view_measure_casts(view_schema, measures: list[str]) -> list[str]:
    """The stored fold type of each measure column in an existing
    view's schema (see _sum_cast)."""
    by_name = {f.name: f.dataType for f in view_schema.fields}
    return [_sum_cast(by_name[m]) for m in measures]


def _insert_only_window(src: Table, after_id: int, to_id: int) -> bool:
    """Metadata-only: True iff every snapshot in ``(after, to]`` is a
    pure fast-append, so the CDC window provably contains no delete
    rows WITHOUT planning or executing the feed (zero Spark actions —
    the top-k realtime read's merge-vs-recompute decision used to cost
    an extra isEmpty() action per read). Walks the same snapshot chain
    ``changes_between`` diffs. Conservative: a delete/merge/overwrite
    commit that happened to remove no rows still reports False and the
    caller recomputes — correct, just not minimal."""
    seen = False
    for s in src.metadata.snapshots:
        if s.snapshot_id == after_id:
            seen = True
            continue
        if seen and s.operation != "append":
            return False
        if s.snapshot_id == to_id:
            break
    return True


def _live_cursor(vt: Table) -> int | None:
    """Last source-snapshot cursor stamped on the view's LIVE lineage
    (rolled-past refreshes are neither applied nor half-applied)."""
    md = vt.metadata
    by_id = {s.snapshot_id: s for s in md.snapshots}
    cur = md.current_snapshot_id
    while cur is not None and cur in by_id:
        s = by_id[cur]
        stamp = s.summary.get("mv-source-cursor")
        if stamp is not None:
            return int(stamp)
        cur = s.parent_id
    return None


def create_maintained_topk(
    cat,
    spark: SparkSession,
    name: str,
    source: str,
    key: str,
    order_cols: list[str],
    k: int,
    columns: list[str] | None = None,
) -> Table:
    """Create a maintained top-k view table over catalog table
    ``source`` and build its initial state from the source's CURRENT
    snapshot (cursor stamped in the same commit)."""
    src = cat.table(source)
    src_df = src.scan(spark)
    if columns:
        src_df = src_df.select(*columns)
    init = topk_frame(src_df, key, order_cols, k)
    vt = cat.create_table(
        name,
        init.schema,
        properties={
            "mv.kind": "topk",
            "mv.source": source,
            "mv.key": key,
            "mv.order": ",".join(order_cols),
            "mv.k": str(k),
            **({"mv.columns": ",".join(columns)} if columns else {}),
            "write.sort.order": key,
        },
    )
    cursor = src.metadata.current_snapshot_id
    vt.append(init, extra_summary={"mv-source-cursor": int(cursor)})
    cat._commit_pins({name: vt.metadata.current_snapshot_id})
    return vt


def _agg_measures(props: dict) -> tuple[list[str], list[str]]:
    """(source value columns, view measure column names) for an agg
    view's stored definition. Single-value views (the original shape)
    name their measure ``sv``; multi-measure views name each
    ``sv_<col>`` (mv.measures stores the names explicitly, so old
    single-value views without it keep reading unchanged)."""
    values = props["mv.value"].split(",")
    measures = props.get("mv.measures", "sv").split(",")
    return values, measures


def create_maintained_agg(
    cat,
    spark: SparkSession,
    name: str,
    source: str,
    key: str,
    value: str | list[str],
) -> Table:
    """Create a maintained per-key additive view over catalog table
    ``source``: count of rows plus the sum of each ``value`` column —
    the self-inverse measures a signed CDC fold can maintain under
    deletes. A single ``value`` string keeps the original (cnt, sv)
    shape; a LIST of columns produces one ``sv_<col>`` measure per
    entry (the common multi-SUM GROUP BY). Measure names are the
    view's columns, so a key colliding with any of them is refused
    loudly (the rename would create a duplicate column and every
    later fold would be ambiguous)."""
    values = [value] if isinstance(value, str) else list(value)
    if not values:
        raise ValueError("maintained agg view needs at least one value column")
    measures = (
        ["sv"] if isinstance(value, str) else [f"sv_{c}" for c in values]
    )
    if len(set(measures)) != len(measures):
        raise ValueError(f"duplicate value columns: {values}")
    if key in ("cnt", *measures):
        raise ValueError(
            f"maintained agg view reserves columns ('cnt', "
            f"{', '.join(repr(m) for m in measures)}); key {key!r} "
            "collides — alias the source column first"
        )
    src = cat.table(source)
    src_df = src.scan(spark)
    src_types = {f.name: f.dataType for f in src_df.schema.fields}
    casts = [_sum_cast(src_types[v]) for v in values]
    init = (
        src_df.groupBy(F.col(key).alias("key"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            *[
                F.sum(F.col(v).cast(c)).cast(c).alias(m)
                for v, m, c in zip(values, measures, casts)
            ],
        )
        .withColumnRenamed("key", key)
    )
    vt = cat.create_table(
        name,
        init.schema,
        properties={
            "mv.kind": "agg",
            "mv.source": source,
            "mv.key": key,
            "mv.value": ",".join(values),
            "mv.measures": ",".join(measures),
            "write.sort.order": key,
        },
    )
    cursor = src.metadata.current_snapshot_id
    vt.append(init, extra_summary={"mv-source-cursor": int(cursor)})
    cat._commit_pins({name: vt.metadata.current_snapshot_id})
    return vt


def create_maintained_extrema(
    cat,
    spark: SparkSession,
    name: str,
    source: str,
    key: str,
    value: str,
) -> Table:
    """Create a maintained per-key MIN/MAX view over catalog table
    ``source``: columns ``(key, mn, mx)`` (round 11). Extrema are NOT
    self-inverse — a delete may remove the current min/max — so the
    fold follows the TOP-K discipline, not the additive one: inserts
    fold incrementally (least/greatest against the view row), the
    delete-touched keys recompute from source (runtime-filter-pruned
    to their files). Refresh cost is O(tail) + O(touched-key files),
    never O(source)."""
    if key in ("mn", "mx"):
        raise ValueError(
            "maintained extrema view reserves columns ('mn', 'mx'); "
            f"key {key!r} collides — alias the source column first"
        )
    src = cat.table(source)
    init = _extrema_frame(src.scan(spark), key, value)
    vt = cat.create_table(
        name,
        init.schema,
        properties={
            "mv.kind": "extrema",
            "mv.source": source,
            "mv.key": key,
            "mv.value": value,
            "write.sort.order": key,
        },
    )
    cursor = src.metadata.current_snapshot_id
    vt.append(init, extra_summary={"mv-source-cursor": int(cursor)})
    cat._commit_pins({name: vt.metadata.current_snapshot_id})
    return vt


def _extrema_frame(src_df: DataFrame, key: str, value: str) -> DataFrame:
    """Full per-key extrema of ``src_df`` — the view's initial build
    and the per-touched-key recompute inside a fold."""
    return src_df.groupBy(key).agg(
        F.min(value).alias("mn"), F.max(value).alias("mx")
    )


def _extrema_fold(
    spark: SparkSession,
    vt: Table,
    ins_agg: DataFrame,
    key: str,
    extra_summary: dict | None = None,
    extra_summary_delete: dict | None = None,
) -> dict:
    """Fold an INSERT-ONLY per-key (mn, mx) delta into the extrema
    view: least/greatest merge over (old view rows ∪ delta rows),
    work sized by the delta's key set — the additive_refresh shape
    with a different merge function (min/max are mergeable under
    inserts; deletes never reach this fold — the caller rebuilds
    their keys from source first)."""
    from ..operators.topk_view import null_key_error

    ins_agg = ins_agg.persist()
    touched = merged = None
    try:
        touched = ins_agg.select(key).distinct().persist()
        trow = touched.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(key).isNull().cast("int")).alias("nulls"),
        ).collect()[0]
        if trow["n"] == 0:
            return {"touched_keys": 0, "view_rows_written": 0}
        if trow["nulls"]:
            raise null_key_error([key], "_extrema_fold")
        scanned, info = vt.scan_runtime_filtered(spark, touched, key)
        old = scanned.join(F.broadcast(touched), key, "left_semi")
        merged = (
            old.unionByName(ins_agg.select(old.columns))
            .groupBy(key)
            .agg(F.min("mn").alias("mn"), F.max("mx").alias("mx"))
            .select(old.columns)
        ).persist()
        rows = merged.count()
        vt.delete_eq_mor(
            spark, touched, [key], extra_summary=extra_summary_delete
        )
        vt.append(merged, extra_summary=extra_summary)
        return {
            "touched_keys": trow["n"],
            "view_rows_written": rows,
            "view_files_total": info["files_total"],
            "view_files_scanned": info["files_scanned"],
        }
    finally:
        # unpersist on EVERY exit (early empty-delta return, null-key
        # raise, crash between delete and append) — round-12 ADVICE
        # fix: the early return used to leak `touched` forever
        if merged is not None:
            merged.unpersist()
        if touched is not None:
            touched.unpersist()
        ins_agg.unpersist()


def _extrema_rebuild_keys(
    spark: SparkSession,
    vt: Table,
    src_df: DataFrame,
    keys_df: DataFrame,
    key: str,
    value: str,
) -> dict:
    """Recompute the extrema view for an explicit key set from SOURCE
    — the delete-path escape hatch, idempotent on replay (like
    topk_view.rebuild_keys: unstamped, recomputes from head state).
    Keys whose every source row was deleted leave the view."""
    from ..operators.topk_view import null_key_error

    keys = keys_df.select(key).distinct().persist()
    krow = keys.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col(key).isNull().cast("int")).alias("nulls"),
    ).collect()[0]
    if krow["n"] == 0:
        return {"touched_keys": 0, "view_rows_written": 0}
    if krow["nulls"]:
        raise null_key_error([key], "_extrema_rebuild_keys")
    new_rows = _extrema_frame(
        src_df.join(F.broadcast(keys), key, "left_semi"), key, value
    )
    rows = new_rows.persist().count()
    vt.delete_eq_mor(spark, keys, [key])
    vt.append(new_rows.select([f.name for f in vt.schema().fields]))
    new_rows.unpersist()
    keys.unpersist()
    return {"touched_keys": krow["n"], "view_rows_written": rows}


def _recompute_frame(
    spark: SparkSession, src: Table, props: dict, view_schema
) -> DataFrame:
    """The view's full content recomputed from the source's CURRENT
    snapshot, per its stored definition. ``view_schema`` pins each
    measure's stored fold type (see _sum_cast) so a rebuild writes
    exactly the view table's column types."""
    key = props["mv.key"]
    src_df = src.scan(spark)
    if props["mv.kind"] == "agg":
        values, measures = _agg_measures(props)
        casts = _view_measure_casts(view_schema, measures)
        return (
            src_df.groupBy(F.col(key).alias("key"))
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                *[
                    F.sum(F.col(v).cast(c)).cast(c).alias(m)
                    for v, m, c in zip(values, measures, casts)
                ],
            )
            .withColumnRenamed("key", key)
        )
    if props["mv.kind"] == "extrema":
        return _extrema_frame(src_df, key, props["mv.value"])
    if "mv.columns" in props:
        src_df = src_df.select(props["mv.columns"].split(","))
    return topk_frame(src_df, key, props["mv.order"].split(","), int(props["mv.k"]))


def _full_rebuild(cat, spark: SparkSession, name: str, vt: Table,
                  src: Table, props: dict, head: int) -> dict:
    """Replace the view's whole content with a recompute in ONE atomic
    overwrite commit carrying the new cursor — the self-heal path when
    incremental refresh is impossible (cursor snapshot expired from
    the source's history, or the view's refresh lineage was rolled
    away). Cost is O(source), the price Iceberg's own MV spec pays in
    the same situation (REFRESH after the change log is gone)."""
    frame = _recompute_frame(spark, src, props, vt.schema())
    entries = vt._write_data_files(frame)
    vt.overwrite_entries(
        entries, extra_summary={"mv-source-cursor": int(head)}
    )
    cat._commit_pins({name: vt.metadata.current_snapshot_id})
    return {"refreshed": True, "rebuilt": True, "cursor_to": head}


def refresh_maintained(cat, spark: SparkSession, name: str) -> dict:
    """Bring the maintained view ``name`` current with its source:
    read the source CDC since the view's cursor, fold it, stamp the
    new cursor, publish the pin. Idempotent — a refresh against an
    unchanged source is a no-op (no commits, no pin motion). Returns
    refresh stats incl. the cursor window.

    Falls back to an atomic FULL REBUILD when incremental refresh is
    impossible: the cursor's source snapshot expired (GC outran the
    refresh cadence) or the view's refresh lineage was rolled away.

    Single-refresher contract (Iceberg MV maintenance-job semantics):
    concurrent refreshes of the SAME view may double-fold a window —
    run one refresher per view, like one streaming query per sink."""
    vt = cat.table(name)
    props = vt.metadata.properties
    kind = props.get("mv.kind")
    if kind not in ("topk", "agg", "extrema"):
        raise ValueError(f"{name!r} is not a maintained view (mv.kind absent)")
    source = props["mv.source"]
    key = props["mv.key"]
    src = cat.table(source)
    cursor = _live_cursor(vt)
    head = src.metadata.current_snapshot_id
    if cursor is None:
        return _full_rebuild(cat, spark, name, vt, src, props, head)
    if head == cursor:
        # caught up — but a crash between a previous fold's cursor
        # append and its pin publish leaves the catalog serving the
        # pre-refresh snapshot forever (this early return used to skip
        # publishing). Republish when the pin lags the view's head.
        pinned = cat.state().pins.get(name)
        cur_snap = vt.metadata.current_snapshot_id
        if pinned != cur_snap:
            cat._commit_pins({name: cur_snap})
            return {"refreshed": False, "cursor": cursor, "pin_republished": True}
        return {"refreshed": False, "cursor": cursor}
    try:
        src.snapshot_by_id(cursor)
    except KeyError:
        # cursor expired from the source's history: no change feed
        return _full_rebuild(cat, spark, name, vt, src, props, head)
    # crash-window repair, the streaming folds' discipline: the cursor
    # stamp rides the fold's APPEND; the fold's DELETE is stamped
    # ``mv-refresh-del``. ANY live delete stamp sitting ABOVE the
    # latest cursor append is a half-applied fold — the view's touched
    # keys are masked but not rewritten — regardless of which target
    # snapshot the stamp names: if the source took another commit
    # after the crash, head has advanced past the stamped id, and
    # matching only the CURRENT head would leave the stale delete in
    # place forever (the view silently loses those keys' rows). A
    # completed refresh's delete always sits BELOW its cursor append,
    # so stopping the walk at the first cursor stamp cannot roll back
    # an applied fold. Roll back to the delete's parent and fold
    # against intact state. (rebuild_keys needs no guard: it
    # recomputes its keys from SOURCE, so replaying it is idempotent.)
    md = vt.metadata
    by_id = {s.snapshot_id: s for s in md.snapshots}
    cur_id = md.current_snapshot_id
    while cur_id is not None and cur_id in by_id:
        s = by_id[cur_id]
        if s.summary.get("mv-source-cursor") is not None:
            break  # completed-refresh boundary: everything below is applied
        if s.summary.get("mv-refresh-del") is not None:
            vt.rollback_to(s.parent_id)
            vt = cat.table(name)
            break
        cur_id = s.parent_id
    stamp = {"mv-source-cursor": int(head)}
    del_stamp = {"mv-refresh-del": int(head)}
    cdc = src.changes_between(spark, cursor).persist()
    try:
        stats: dict
        if kind == "agg":
            values, measures = _agg_measures(props)
            casts = _view_measure_casts(vt.schema(), measures)
            sign = F.when(F.col("_change_type") == "insert", 1).otherwise(-1)
            delta = cdc.groupBy(F.col(key)).agg(
                F.sum(sign).cast("long").alias("cnt"),
                *[
                    F.sum(sign * F.col(v).cast(c)).cast(c).alias(m)
                    for v, m, c in zip(values, measures, casts)
                ],
            )
            stats = additive_refresh(
                spark, vt, delta, [key],
                extra_summary=stamp, extra_summary_delete=del_stamp,
                drop_when_zero="cnt",
            )
        elif kind == "extrema":
            value = props["mv.value"]
            deletes = cdc.filter(F.col("_change_type") == "delete")
            inserts = cdc.filter(F.col("_change_type") == "insert")
            ins_agg = _extrema_frame(inserts, key, value)
            del_keys = deletes.select(key).distinct().persist()
            n_del = del_keys.count()
            if n_del:
                # delete-touched keys rebuild from SOURCE (a delete
                # can remove the current min/max); insert-only keys
                # fold incrementally, stamping the cursor
                stats = _extrema_rebuild_keys(
                    spark, vt, src.scan(spark), del_keys, key, value
                )
                ins_agg = ins_agg.join(del_keys, key, "left_anti")
                s2 = _extrema_fold(
                    spark, vt, ins_agg, key,
                    extra_summary=stamp, extra_summary_delete=del_stamp,
                )
                stats = {
                    "touched_keys": stats["touched_keys"] + s2["touched_keys"],
                    "view_rows_written": stats["view_rows_written"]
                    + s2["view_rows_written"],
                }
            else:
                stats = _extrema_fold(
                    spark, vt, ins_agg, key,
                    extra_summary=stamp, extra_summary_delete=del_stamp,
                )
            del_keys.unpersist()
        else:
            order_cols = props["mv.order"].split(",")
            k = int(props["mv.k"])
            cols = (
                props["mv.columns"].split(",")
                if "mv.columns" in props
                else [c for c in cdc.columns if c != "_change_type"]
            )
            deletes = cdc.filter(F.col("_change_type") == "delete")
            inserts = cdc.filter(F.col("_change_type") == "insert").select(cols)
            del_keys = deletes.select(key).distinct().persist()
            n_del = del_keys.count()
            if n_del:
                # delete-touched keys rebuild from SOURCE (a delete can
                # promote a row the view no longer holds); insert-only
                # keys fold incrementally, stamping the cursor
                src_df = src.scan(spark)
                if "mv.columns" in props:
                    src_df = src_df.select(cols)
                stats = rebuild_keys(
                    spark, vt, src_df, del_keys, key, order_cols, k
                )
                inserts = inserts.join(del_keys, key, "left_anti")
                s2 = topk_refresh(
                    spark, vt, inserts, key, order_cols, k,
                    extra_summary=stamp, extra_summary_delete=del_stamp,
                )
                stats = {
                    "touched_keys": stats["touched_keys"] + s2["touched_keys"],
                    "view_rows_written": stats["view_rows_written"]
                    + s2["view_rows_written"],
                }
            else:
                stats = topk_refresh(
                    spark, vt, inserts, key, order_cols, k,
                    extra_summary=stamp, extra_summary_delete=del_stamp,
                )
            del_keys.unpersist()
        # a no-op fold (empty CDC window — e.g. the source only
        # compacted — or every insert key rebuilt) commits nothing, so
        # the cursor still needs a stamp: a metadata-only empty append.
        # Re-folding an empty window on replay is harmless, so this
        # stamp needs no crash guard.
        vt = cat.table(name)
        if _live_cursor(vt) != head:
            vt.append(spark.createDataFrame([], vt.schema()), extra_summary=stamp)
        cat._commit_pins({name: vt.metadata.current_snapshot_id})
        return {
            "refreshed": True,
            "cursor_from": cursor,
            "cursor_to": head,
            **stats,
        }
    finally:
        cdc.unpersist()


# Frames persisted by read_realtime's bounded-merge paths (the cdc /
# delete-key sets the returned LAZY frame re-reads): they cannot be
# unpersisted before the caller's action runs, so they live here until
# the NEXT read_realtime call (or an explicit release) drains them —
# bounding cached blocks to one read's pins instead of accumulating
# until ContextCleaner GC (round-12 ADVICE fix). Unpersisting a frame
# a caller still holds is safe: it recomputes, it does not break.
_REALTIME_PINS: list[DataFrame] = []


def release_realtime_pins() -> int:
    """Unpersist every frame pinned by earlier ``read_realtime`` calls
    (non-blocking); returns how many were released."""
    n = len(_REALTIME_PINS)
    for df in _REALTIME_PINS:
        try:
            df.unpersist()
        except Exception:
            pass  # a stopped/replaced SparkContext already dropped it
    _REALTIME_PINS.clear()
    return n


def read_realtime(
    cat, spark: SparkSession, name: str, strict: bool = False
) -> DataFrame:
    """REAL-TIME read of a maintained AGG view (TimescaleDB's
    real-time continuous aggregates): the materialized rows UNION a
    signed fold of the source's change feed SINCE THE CURSOR,
    re-aggregated — the exact current answer without waiting for (or
    paying) a refresh. Cost is O(view) + O(changes since cursor): the
    view side is one row per key and the tail is the CDC of the
    un-refreshed window only, so the read stays delta-sized however
    large the source is; a caught-up view reads as a plain scan.

    Agg views merge exactly in all cases (count/sum are mergeable
    across the materialized/tail boundary, deletes enter with sign
    −1). Top-k views merge insert-only tails as (materialized ∪ tail
    inserts); a tail WITH deletes takes the BOUNDED merge (round 11):
    delete-touched keys recompute from source with the scan runtime-
    filter-pruned to their files, untouched keys merge as insert-only
    — O(tail) + O(touched keys' files), never O(source). Both kinds
    fall back to the full recompute only when the cursor expired from
    the source's history, the refresh lineage was rolled away, or a
    crashed refresh left a half-applied fold (reads never repair).

    ``strict=True`` (the SQL ``/*+ REALTIME */`` hint's contract)
    REFUSES those full-recompute fallbacks instead of silently paying
    O(source): a "realtime" read that quietly becomes a full recompute
    is a cost cliff a SQL caller cannot see. The Python API keeps the
    exact-fallback default — callers who read this docstring can
    choose."""

    def _fallback(reason: str) -> DataFrame:
        if strict:
            raise ValueError(
                f"realtime read of {name!r} cannot be served at "
                f"O(view)+O(tail): {reason} — run REFRESH MATERIALIZED "
                f"VIEW {name} first, or read without /*+ REALTIME */"
            )
        return _recompute_frame(spark, src, props, vt.schema())
    release_realtime_pins()  # previous reads' cdc/del-key caches
    vt = cat.table(name)
    props = vt.metadata.properties
    kind = props.get("mv.kind")
    if kind not in ("agg", "topk", "extrema"):
        raise ValueError(
            f"{name!r} is not a maintained view (mv.kind absent)"
        )
    key = props["mv.key"]
    src = cat.table(props["mv.source"])
    cursor = _live_cursor(vt)
    head = src.metadata.current_snapshot_id
    # half-applied-fold guard (the refresh path's crash-window walk,
    # read-only form): a live mv-refresh-del ABOVE the latest cursor
    # append means a crashed refresh masked the touched keys' rows
    # without rewriting them — merging that view with the old-cursor
    # tail would report only the delta for those keys. A read must not
    # repair (no writes on the read path); fall back to the exact
    # recompute until refresh_maintained's rollback runs.
    md = vt.metadata
    by_id = {s.snapshot_id: s for s in md.snapshots}
    cur_id = md.current_snapshot_id
    while cur_id is not None and cur_id in by_id:
        s = by_id[cur_id]
        if s.summary.get("mv-source-cursor") is not None:
            break  # completed-refresh boundary: view content intact
        if s.summary.get("mv-refresh-del") is not None:
            return _fallback("a crashed refresh left a half-applied fold")
        cur_id = s.parent_id
    view_df = vt.scan(spark)
    if cursor is not None and head == cursor:
        return view_df  # caught up: the materialized rows ARE current
    if cursor is None:
        return _fallback("the view's refresh lineage was rolled away")
    try:
        src.snapshot_by_id(cursor)
    except KeyError:  # cursor expired: no change feed to fold
        return _fallback("the cursor snapshot expired from the source")
    if kind == "topk":
        order_cols = props["mv.order"].split(",")
        k = int(props["mv.k"])
        cols = [c for c in view_df.columns if c != "rn"]
        if _insert_only_window(src, cursor, head):
            # INSERT-ONLY tail (append-only sources, the common case):
            # top-k over (materialized rows ∪ tail inserts) —
            # candidates per key are ≤ k view rows plus the tail. The
            # decision is METADATA-only (snapshot ops in the window),
            # so this path plans exactly one Spark job — no per-read
            # isEmpty() probe of the feed (round-11).
            cdc = src.changes_between(spark, cursor)
            cand = view_df.select(cols).unionByName(
                cdc.filter(F.col("_change_type") == "insert").select(cols)
            )
            return topk_frame(cand, key, order_cols, k).select(view_df.columns)
        # Tail WITH deletes (round 11): a delete can promote a row the
        # view no longer holds, so the touched KEYS need source access
        # — but only those keys. BOUNDED merge, the read-only mirror of
        # the refresh path's rebuild_keys + left_anti fold:
        #   touched   = keys of the tail's delete rows (delta-sized)
        #   touched → exact top-k from SOURCE, runtime-filter-pruned
        #             to the files whose stats admit a touched key
        #   untouched → (view rows ∪ tail inserts), as insert-only
        # Cost is O(tail) + O(touched keys' source files), never
        # O(source) — this serves under strict (the SQL hint) too; the
        # remaining strict refusals are the true O(source) recomputes
        # (expired cursor, rolled-away lineage, half-applied fold).
        cdc = src.changes_between(spark, cursor).persist()
        del_keys = (
            cdc.filter(F.col("_change_type") == "delete")
            .select(key)
            .distinct()
            .persist()
        )
        _REALTIME_PINS.extend((cdc, del_keys))
        touched_src, _info = src.scan_runtime_filtered(spark, del_keys, key)
        if "mv.columns" in props:
            touched_src = touched_src.select(cols)
        touched_top = topk_frame(
            touched_src.join(F.broadcast(del_keys), key, "left_semi"),
            key, order_cols, k,
        )
        inserts = (
            cdc.filter(F.col("_change_type") == "insert")
            .select(cols)
            .join(F.broadcast(del_keys), key, "left_anti")
        )
        cand = (
            view_df.select(cols)
            .join(F.broadcast(del_keys), key, "left_anti")
            .unionByName(inserts)
        )
        untouched_top = topk_frame(cand, key, order_cols, k)
        return (
            untouched_top.select(view_df.columns)
            .unionByName(touched_top.select(view_df.columns))
        )
    if kind == "extrema":
        value = props["mv.value"]
        cols = list(view_df.columns)
        if _insert_only_window(src, cursor, head):
            # least/greatest merge of (view rows ∪ tail-insert agg) —
            # min/max are mergeable under inserts
            cdc = src.changes_between(spark, cursor)
            tail = _extrema_frame(
                cdc.filter(F.col("_change_type") == "insert"), key, value
            )
            return (
                view_df.unionByName(tail.select(cols))
                .groupBy(key)
                .agg(F.min("mn").alias("mn"), F.max("mx").alias("mx"))
                .select(cols)
            )
        # tail WITH deletes: bounded merge, exactly the top-k shape —
        # delete-touched keys recompute from source (runtime-filter-
        # pruned), untouched keys merge as insert-only
        cdc = src.changes_between(spark, cursor).persist()
        del_keys = (
            cdc.filter(F.col("_change_type") == "delete")
            .select(key)
            .distinct()
            .persist()
        )
        _REALTIME_PINS.extend((cdc, del_keys))
        touched_src, _info = src.scan_runtime_filtered(spark, del_keys, key)
        touched = _extrema_frame(
            touched_src.join(F.broadcast(del_keys), key, "left_semi"),
            key, value,
        )
        tail = _extrema_frame(
            cdc.filter(F.col("_change_type") == "insert")
            .join(F.broadcast(del_keys), key, "left_anti"),
            key, value,
        )
        untouched = (
            view_df.join(F.broadcast(del_keys), key, "left_anti")
            .unionByName(tail.select(cols))
            .groupBy(key)
            .agg(F.min("mn").alias("mn"), F.max("mx").alias("mx"))
        )
        return untouched.select(cols).unionByName(touched.select(cols))
    cdc = src.changes_between(spark, cursor)
    values, measures = _agg_measures(props)
    casts = _view_measure_casts(vt.schema(), measures)
    sign = F.when(F.col("_change_type") == "insert", 1).otherwise(-1)
    tail = cdc.groupBy(F.col(key)).agg(
        F.sum(sign).cast("long").alias("cnt"),
        *[
            F.sum(sign * F.col(v).cast(c)).cast(c).alias(m)
            for v, m, c in zip(values, measures, casts)
        ],
    )
    merged = (
        view_df.unionByName(tail.select(view_df.columns))
        .groupBy(key)
        .agg(
            F.sum("cnt").cast("long").alias("cnt"),
            *[
                F.sum(m).cast(c).alias(m)
                for m, c in zip(measures, casts)
            ],
        )
        .filter(F.col("cnt") != 0)
        .select(view_df.columns)
    )
    return merged


def list_maintained(cat) -> dict[str, dict]:
    """Every maintained view in the catalog: name -> its mv.* properties."""
    out = {}
    for name in cat.list_tables():
        props = cat.table(name).metadata.properties
        if props.get("mv.kind") in ("topk", "agg", "extrema"):
            out[name] = props
    return out


def refresh_all_maintained(cat, spark: SparkSession) -> dict[str, dict]:
    """Refresh every maintained view in the catalog in DEPENDENCY
    order (a view may source another view — mv-over-mv composes
    because a fold's MOR delete + append surfaces through the source's
    change feed as delete/insert rows, which both fold kinds already
    consume): sources refresh before dependents, so one pass brings
    the whole DAG current with each base table's head. A cycle in
    mv.source refuses loudly. Returns per-view refresh stats in the
    order executed. Per-view pins publish as each refresh lands (the
    single-refresher contract is per VIEW; this helper is the
    maintenance-job shape that owns all of them)."""
    views = list_maintained(cat)
    order: list[str] = []
    state: dict[str, int] = {}  # 0=visiting, 1=done

    def visit(name: str, chain: tuple) -> None:
        if state.get(name) == 1:
            return
        if state.get(name) == 0:
            raise ValueError(
                f"maintained-view cycle through {name!r}: "
                f"{' -> '.join(chain + (name,))}"
            )
        state[name] = 0
        src = views[name]["mv.source"]
        if src in views:
            visit(src, chain + (name,))
        state[name] = 1
        order.append(name)

    for name in sorted(views):
        visit(name, ())
    return {name: refresh_maintained(cat, spark, name) for name in order}
