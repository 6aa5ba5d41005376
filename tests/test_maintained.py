"""Maintained views as catalog objects: create, CDC-cursor refresh,
delete-path rebuild, idempotence, crash-window repair."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from java_iceberg_table_spark.operators.topk_view import topk_frame
from java_iceberg_table_spark.table import Catalog
from java_iceberg_table_spark.table.maintained import (
    create_maintained_agg,
    create_maintained_topk,
    refresh_maintained,
)


@pytest.fixture()
def cat(tmp_path, spark):
    c = Catalog.create(str(tmp_path / "cat"))
    src = c.create_table(
        "events", spark.createDataFrame([], "k long, v long, ts long").schema
    )
    src.append(
        spark.createDataFrame(
            [(i % 5, (i * 37) % 100, i) for i in range(40)],
            "k long, v long, ts long",
        )
    )
    c._commit_pins({"events": src.metadata.current_snapshot_id})
    return c


def _topk_equals(spark, cat, k=3) -> bool:
    src = cat.table("events").scan(spark)
    mv = cat.table("top_events").scan(spark)
    rec = topk_frame(src, "k", ["ts", "v"], k).select(mv.columns)
    return mv.exceptAll(rec).isEmpty() and rec.exceptAll(mv).isEmpty()


def _agg_equals(spark, cat) -> bool:
    src = cat.table("events").scan(spark)
    mv = cat.table("sums").scan(spark).select("k", "cnt", "sv")
    rec = src.groupBy("k").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("v").alias("sv"),
    )
    return mv.exceptAll(rec).isEmpty() and rec.exceptAll(mv).isEmpty()


def test_maintained_topk_lifecycle(spark, cat):
    create_maintained_topk(
        cat, spark, "top_events", "events", "k", ["ts", "v"], 3
    )
    assert _topk_equals(spark, cat)
    # unchanged source: refresh is a no-op, no commits
    n_snaps = len(cat.table("top_events").metadata.snapshots)
    res = refresh_maintained(cat, spark, "top_events")
    assert res == {"refreshed": False, "cursor": res["cursor"]}
    assert len(cat.table("top_events").metadata.snapshots) == n_snaps
    # source grows (some displacing rows): refresh folds the delta
    src = cat.table("events")
    src.append(
        spark.createDataFrame(
            [(1, 200, 0), (6, 1, 1), (6, 2, 2)], "k long, v long, ts long"
        )
    )
    cat._commit_pins({"events": src.metadata.current_snapshot_id})
    res = refresh_maintained(cat, spark, "top_events")
    assert res["refreshed"] and res["touched_keys"] == 2  # keys 1, 6
    assert _topk_equals(spark, cat)
    # refresh again: cursor caught up, no-op
    assert refresh_maintained(cat, spark, "top_events")["refreshed"] is False


def test_maintained_topk_source_delete_rebuilds(spark, cat):
    create_maintained_topk(
        cat, spark, "top_events", "events", "k", ["ts", "v"], 3
    )
    src = cat.table("events")
    # delete rows that are IN the current top-3 of key 0 (ts 0,5,10):
    # the view must promote later rows it no longer holds
    src.delete_eq_mor(
        spark,
        spark.createDataFrame([(0,), (5,)], "ts long"),
        ["ts"],
    )
    cat._commit_pins({"events": src.metadata.current_snapshot_id})
    res = refresh_maintained(cat, spark, "top_events")
    assert res["refreshed"]
    assert _topk_equals(spark, cat)
    # a key whose EVERY source row is deleted leaves the view (the
    # rebuild recomputes its top-k from an empty set)
    src = cat.table("events")
    key0_ts = [
        (r["ts"],)
        for r in src.scan(spark).filter(F.col("k") == 0).select("ts").collect()
    ]
    src.delete_eq_mor(spark, spark.createDataFrame(key0_ts, "ts long"), ["ts"])
    cat._commit_pins({"events": src.metadata.current_snapshot_id})
    assert refresh_maintained(cat, spark, "top_events")["refreshed"]
    assert _topk_equals(spark, cat)
    assert (
        cat.table("top_events").scan(spark).filter(F.col("k") == 0).count()
        == 0
    )


def test_maintained_agg_lifecycle(spark, cat):
    create_maintained_agg(cat, spark, "sums", "events", "k", "v")
    assert _agg_equals(spark, cat)
    src = cat.table("events")
    src.append(
        spark.createDataFrame([(2, 50, 100), (7, 3, 101)], "k long, v long, ts long")
    )
    src.delete_eq_mor(
        spark, spark.createDataFrame([(1,), (6,)], "ts long"), ["ts"]
    )
    cat._commit_pins({"events": src.metadata.current_snapshot_id})
    res = refresh_maintained(cat, spark, "sums")
    assert res["refreshed"]
    assert _agg_equals(spark, cat)
    assert refresh_maintained(cat, spark, "sums")["refreshed"] is False
    # a key whose EVERY source row is deleted must leave the view
    # entirely (not linger as a zero row — the recompute has no row)
    src = cat.table("events")
    key7_ts = [
        (r["ts"],)
        for r in src.scan(spark).filter(F.col("k") == 7).select("ts").collect()
    ]
    src.delete_eq_mor(spark, spark.createDataFrame(key7_ts, "ts long"), ["ts"])
    cat._commit_pins({"events": src.metadata.current_snapshot_id})
    assert refresh_maintained(cat, spark, "sums")["refreshed"]
    assert _agg_equals(spark, cat)
    assert (
        cat.table("sums").scan(spark).filter(F.col("k") == 7).count() == 0
    )


def test_maintained_refresh_crash_window_repair(spark, cat):
    """A refresh that crashed between its fold's delete and append
    leaves the view's touched keys deleted; the next refresh must find
    the stamped half-applied delete, roll it back, and fold against
    intact state."""
    create_maintained_topk(
        cat, spark, "top_events", "events", "k", ["ts", "v"], 3
    )
    src = cat.table("events")
    more = spark.createDataFrame([(1, 200, 0)], "k long, v long, ts long")
    src.append(more)
    cat._commit_pins({"events": src.metadata.current_snapshot_id})
    head = src.metadata.current_snapshot_id
    # simulate the crash window: the fold's stamped delete lands, the
    # append (which would carry the cursor) does not
    vt = cat.table("top_events")
    vt.delete_eq_mor(
        spark,
        more.select("k").distinct(),
        ["k"],
        extra_summary={"mv-refresh-del": int(head)},
    )
    # view is now WRONG (key 1's rows masked); refresh must repair
    res = refresh_maintained(cat, spark, "top_events")
    assert res["refreshed"]
    assert _topk_equals(spark, cat)
    assert refresh_maintained(cat, spark, "top_events")["refreshed"] is False


def test_maintained_refresh_compaction_only_window(spark, cat):
    """A source window with no row changes (compaction) still advances
    the cursor (empty-append stamp), so the window is not re-read."""
    create_maintained_topk(
        cat, spark, "top_events", "events", "k", ["ts", "v"], 3
    )
    src = cat.table("events")
    src.compact_data_files(spark)
    cat._commit_pins({"events": src.metadata.current_snapshot_id})
    res = refresh_maintained(cat, spark, "top_events")
    assert res["refreshed"] and res.get("touched_keys", 0) == 0
    assert _topk_equals(spark, cat)
    assert refresh_maintained(cat, spark, "top_events")["refreshed"] is False


def test_maintained_refresh_after_cursor_expiry_rebuilds(spark, cat):
    """When the source expires the cursor's snapshot (GC outran the
    refresh cadence) there is no change feed — refresh must self-heal
    with an atomic full rebuild carrying the new cursor."""
    create_maintained_topk(
        cat, spark, "top_events", "events", "k", ["ts", "v"], 3
    )
    src = cat.table("events")
    src.append(
        spark.createDataFrame([(1, 200, 0), (9, 5, 1)], "k long, v long, ts long")
    )
    import time as _time

    src.expire_snapshots(
        older_than_ms=int(_time.time() * 1000) + 60_000, retain_last=1
    )
    cat._commit_pins({"events": src.metadata.current_snapshot_id})
    res = refresh_maintained(cat, spark, "top_events")
    assert res["refreshed"] and res.get("rebuilt") is True
    assert _topk_equals(spark, cat)
    # cursor advanced in the same overwrite commit: next refresh no-ops
    assert refresh_maintained(cat, spark, "top_events")["refreshed"] is False


def test_maintained_refresh_random_crash_schedules(spark, cat):
    """Chaos replays for the catalog refresh (mirrors the streaming
    folds' chaos tests): per round a seeded scenario — clean refresh,
    crash between the fold's delete and append (stamped half-applied
    delete), external rollback of the view past the whole refresh —
    each followed by a repairing refresh. Invariant: view equals the
    top-k recompute after every round, and a final extra refresh is a
    no-op."""
    import random

    from java_iceberg_table_spark.table import load_table as open_table

    create_maintained_topk(
        cat, spark, "top_events", "events", "k", ["ts", "v"], 3
    )
    rng = random.Random(17)
    for b in range(1, 7):
        src = cat.table("events")
        more = spark.createDataFrame(
            [(b * 100 + i, (b + i) % 6, 1000 + b * 10 + i) for i in range(5)],
            "k long, v long, ts long",
        )
        src.append(more)
        cat._commit_pins({"events": src.metadata.current_snapshot_id})
        head = src.metadata.current_snapshot_id
        scenario = rng.choice(["clean", "del_only", "del_stale", "rb_past"])
        if scenario == "del_only":
            # the fold's stamped delete lands; the cursor append does not
            vt = cat.table("top_events")
            vt.delete_eq_mor(
                spark,
                more.select("k").distinct(),
                ["k"],
                extra_summary={"mv-refresh-del": int(head)},
            )
        elif scenario == "del_stale":
            # the fold's stamped delete lands, the refresher dies, and
            # the SOURCE MOVES ON before the next refresh: the stamp
            # names a head that is no longer current — the round-10
            # repair rule (any live delete above the cursor append)
            # must still roll it back
            vt = cat.table("top_events")
            vt.delete_eq_mor(
                spark,
                more.select("k").distinct(),
                ["k"],
                extra_summary={"mv-refresh-del": int(head)},
            )
            src.append(
                spark.createDataFrame(
                    [(b * 100 + 50, (b + 3) % 6, 2000 + b)],
                    "k long, v long, ts long",
                )
            )
            cat._commit_pins({"events": src.metadata.current_snapshot_id})
        elif scenario == "rb_past":
            # a completed refresh rolled away externally: cursor AND
            # content regress together; the next refresh re-folds the
            # wider window against the rolled-back state
            res = refresh_maintained(cat, spark, "top_events")
            assert res["refreshed"]
            vt = open_table(cat.table("top_events").root)
            head_snap = vt.metadata.current_snapshot()
            # walk back past this refresh's commits (cursor append +
            # delete): roll to the delete's parent's parent if the fold
            # committed, else just the stamp commit's parent
            by_id = {s.snapshot_id: s for s in vt.metadata.snapshots}
            target = head_snap.parent_id
            if target in by_id and by_id[target].summary.get(
                "mv-refresh-del"
            ) == int(head):
                target = by_id[target].parent_id
            vt.rollback_to(target)
        res = refresh_maintained(cat, spark, "top_events")
        assert res["refreshed"], (b, scenario)
        assert _topk_equals(spark, cat), (b, scenario)
        assert (
            refresh_maintained(cat, spark, "top_events")["refreshed"] is False
        ), (b, scenario)


def test_refresh_refuses_non_maintained(spark, cat):
    with pytest.raises(ValueError, match="not a maintained view"):
        refresh_maintained(cat, spark, "events")


def test_maintained_refresh_stale_crash_delete_repaired(spark, cat):
    """Crash repair when the SOURCE MOVED ON after the crash: a fold
    targeting head1 commits its stamped delete and dies; the source
    then takes another commit (head2) before the next refresh. The
    half-applied delete is stamped with head1 while the repairing
    refresh targets head2 — matching only the current head would leave
    the stale delete in place forever and the view would silently lose
    the touched keys' rows. The repair rule must treat ANY live
    mv-refresh-del above the latest cursor append as half-applied."""
    create_maintained_topk(
        cat, spark, "top_events", "events", "k", ["ts", "v"], 3
    )
    src = cat.table("events")
    more = spark.createDataFrame([(1, 200, 500)], "k long, v long, ts long")
    src.append(more)
    cat._commit_pins({"events": src.metadata.current_snapshot_id})
    head1 = src.metadata.current_snapshot_id
    # crashed fold for the head1 refresh: stamped delete, no append
    vt = cat.table("top_events")
    vt.delete_eq_mor(
        spark,
        more.select("k").distinct(),
        ["k"],
        extra_summary={"mv-refresh-del": int(head1)},
    )
    # the source advances BEFORE the repairing refresh runs
    src.append(
        spark.createDataFrame([(2, 300, 501)], "k long, v long, ts long")
    )
    cat._commit_pins({"events": src.metadata.current_snapshot_id})
    assert src.metadata.current_snapshot_id != head1
    res = refresh_maintained(cat, spark, "top_events")
    assert res["refreshed"]
    assert _topk_equals(spark, cat)  # key 1's pre-existing rows intact
    assert refresh_maintained(cat, spark, "top_events")["refreshed"] is False


def test_maintained_caughtup_refresh_republishes_stale_pin(
    spark, cat, monkeypatch
):
    """Crash between the fold's cursor append and the catalog pin
    publish: the next refresh takes the caught-up early return, which
    must still republish the pin — otherwise catalog readers serve the
    pre-refresh snapshot until an unrelated source change."""
    create_maintained_topk(
        cat, spark, "top_events", "events", "k", ["ts", "v"], 3
    )
    src = cat.table("events")
    src.append(
        spark.createDataFrame([(1, 200, 500)], "k long, v long, ts long")
    )
    cat._commit_pins({"events": src.metadata.current_snapshot_id})
    vt_before = cat.state().pins["top_events"]
    # crash window: the fold's commits land, the pin publish does not
    monkeypatch.setattr(cat, "_commit_pins", lambda updates: None)
    res = refresh_maintained(cat, spark, "top_events")
    assert res["refreshed"]
    monkeypatch.undo()
    fresh = cat.table("top_events").metadata.current_snapshot_id
    assert cat.state().pins["top_events"] == vt_before != fresh
    res = refresh_maintained(cat, spark, "top_events")
    assert res["refreshed"] is False and res.get("pin_republished") is True
    assert cat.state().pins["top_events"] == fresh
    # catalog read now serves the refreshed content
    mv = cat.read(spark, "top_events")
    rec = topk_frame(cat.read(spark, "events"), "k", ["ts", "v"], 3).select(
        mv.columns
    )
    assert mv.exceptAll(rec).isEmpty() and rec.exceptAll(mv).isEmpty()
    # steady state: no further republish churn
    res = refresh_maintained(cat, spark, "top_events")
    assert res == {"refreshed": False, "cursor": res["cursor"]}


def test_fold_refuses_null_keys(spark, cat):
    """NULL partition keys are out of the fold contract (eq-delete and
    semi join never match NULL → duplicate view rows accumulate): every
    fold entry refuses them loudly instead of corrupting the view."""
    from java_iceberg_table_spark.operators.agg_view import additive_refresh
    from java_iceberg_table_spark.operators.topk_view import (
        rebuild_keys,
        topk_refresh,
    )

    create_maintained_topk(
        cat, spark, "top_events", "events", "k", ["ts", "v"], 3
    )
    create_maintained_agg(cat, spark, "sums", "events", "k", "v")
    vt = cat.table("top_events")
    null_delta = spark.createDataFrame(
        [(None, 1, 999), (3, 2, 1000)], "k long, v long, ts long"
    )
    with pytest.raises(ValueError, match="NULL"):
        topk_refresh(spark, vt, null_delta, "k", ["ts", "v"], 3)
    with pytest.raises(ValueError, match="NULL"):
        rebuild_keys(
            spark, vt, cat.table("events").scan(spark),
            null_delta.select("k"), "k", ["ts", "v"], 3,
        )
    at = cat.table("sums")
    null_agg = spark.createDataFrame(
        [(None, 2, 5.0)], "k long, cnt long, sv double"
    )
    with pytest.raises(ValueError, match="NULL"):
        additive_refresh(spark, at, null_agg, ["k"])
    # the view is untouched by a refused fold
    assert _topk_equals(spark, cat) and _agg_equals(spark, cat)


def test_refresh_all_maintained_dag_order(spark, cat):
    """refresh_all_maintained brings a whole MV DAG current in one
    pass: an agg view over events, an agg view OVER THAT VIEW (the
    fold's MOR delete + append surfaces through the change feed as
    delete/insert rows, which the signed fold consumes), and a top-k
    view — sources refresh before dependents, every view equals its
    recompute afterwards, and a second pass is a no-op."""
    from java_iceberg_table_spark.table.maintained import (
        refresh_all_maintained,
    )

    create_maintained_agg(cat, spark, "sums", "events", "k", "v")
    # a view OVER a view: folds arrive as the sums MV's own CDC
    create_maintained_agg(cat, spark, "sums2", "sums", "k", "sv")
    create_maintained_topk(
        cat, spark, "top_events", "events", "k", ["ts", "v"], 3
    )
    # the view's measure names are reserved as keys
    with pytest.raises(ValueError, match="reserves"):
        create_maintained_agg(cat, spark, "bad", "sums", "cnt", "sv")
    src = cat.table("events")
    src.append(
        spark.createDataFrame(
            [(1, 200, 500), (9, 5, 501), (2, 7, 502)],
            "k long, v long, ts long",
        )
    )
    src.delete_eq_mor(
        spark, spark.createDataFrame([(3,)], "ts long"), ["ts"]
    )
    cat._commit_pins({"events": src.metadata.current_snapshot_id})
    res = refresh_all_maintained(cat, spark)
    names = list(res)
    assert names.index("sums") < names.index("sums2")  # dependency order
    assert res["sums"]["refreshed"] and res["top_events"]["refreshed"]
    assert _agg_equals(spark, cat) and _topk_equals(spark, cat)
    # sums2 equals the recompute over the REFRESHED sums
    mv2 = cat.table("sums2").scan(spark).select("k", "cnt", "sv")
    rec2 = (
        cat.table("sums").scan(spark)
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("sv").alias("sv"),
        )
    )
    assert mv2.exceptAll(rec2.select(mv2.columns)).isEmpty()
    assert rec2.select(mv2.columns).exceptAll(mv2).isEmpty()
    # second pass: everything caught up
    res2 = refresh_all_maintained(cat, spark)
    assert all(r["refreshed"] is False for r in res2.values())


def test_refresh_all_maintained_cycle_refused(spark, cat):
    from java_iceberg_table_spark.table.maintained import (
        refresh_all_maintained,
    )

    create_maintained_agg(cat, spark, "sums", "events", "k", "v")
    create_maintained_agg(cat, spark, "sums2", "sums", "k", "sv")
    # force a cycle: sums now claims to source sums2
    cat.table("sums").set_properties({"mv.source": "sums2"})
    with pytest.raises(ValueError, match="cycle"):
        refresh_all_maintained(cat, spark)


def test_read_realtime_agg(spark, cat):
    """Real-time continuous aggregate (round 10): the materialized
    rows UNION a signed fold of the CDC tail since the cursor — exact
    current answer without a refresh, delta-sized read."""
    from java_iceberg_table_spark.table.maintained import read_realtime

    create_maintained_agg(cat, spark, "sums", "events", "k", "v")

    def recompute():
        return (
            cat.table("events").scan(spark)
            .groupBy("k")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.sum("v").alias("sv"),
            )
        )

    def rt_equals_recompute():
        rt = read_realtime(cat, spark, "sums")
        rec = recompute().select(rt.columns)
        return rt.exceptAll(rec).isEmpty() and rec.exceptAll(rt).isEmpty()

    # caught up: realtime IS the view
    assert rt_equals_recompute()
    # source churn WITHOUT refresh: view is stale, realtime is exact
    src = cat.table("events")
    src.append(
        spark.createDataFrame(
            [(1, 500, 100), (9, 7, 101)], "k long, v long, ts long"
        )
    )
    src.delete_eq_mor(spark, spark.createDataFrame([(0,)], "ts long"), ["ts"])
    cat._commit_pins({"events": src.metadata.current_snapshot_id})
    stale = cat.table("sums").scan(spark)
    rec = recompute().select(stale.columns)
    assert not stale.exceptAll(rec).isEmpty()  # materialized alone: stale
    assert rt_equals_recompute()  # realtime: exact
    # a key fully deleted in the tail leaves the realtime answer
    all_k2 = cat.table("events").scan(spark).filter(F.col("k") == 2)
    src = cat.table("events")
    src.delete_eq_mor(spark, all_k2.select("ts"), ["ts"])
    cat._commit_pins({"events": src.metadata.current_snapshot_id})
    rt = read_realtime(cat, spark, "sums")
    assert rt.filter(F.col("k") == 2).isEmpty()
    assert rt_equals_recompute()
    # after a refresh the view catches up and realtime is a plain scan
    refresh_maintained(cat, spark, "sums")
    assert rt_equals_recompute()
    # top-k realtime: insert-only tails merge (view ∪ tail inserts);
    # a tail delete takes the BOUNDED merge (touched keys from source)
    create_maintained_topk(cat, spark, "top_events", "events", "k", ["ts", "v"], 3)
    src = cat.table("events")
    src.append(
        spark.createDataFrame([(3, 1, 300)], "k long, v long, ts long")
    )
    cat._commit_pins({"events": src.metadata.current_snapshot_id})

    def topk_rt_equals():
        rt = read_realtime(cat, spark, "top_events")
        rec = topk_frame(
            cat.table("events").scan(spark), "k", ["ts", "v"], 3
        ).select(rt.columns)
        return rt.exceptAll(rec).isEmpty() and rec.exceptAll(rt).isEmpty()

    assert topk_rt_equals()  # insert-only tail, merged read
    src = cat.table("events")
    src.delete_eq_mor(
        spark, spark.createDataFrame([(300,)], "ts long"), ["ts"]
    )
    cat._commit_pins({"events": src.metadata.current_snapshot_id})
    assert topk_rt_equals()  # delete in tail -> bounded touched-key merge
    # the bounded merge must also handle a PROMOTION: delete a row the
    # view holds while a displaced row only exists in the source
    src = cat.table("events")
    held = (
        cat.table("top_events").scan(spark)
        .orderBy("k", "rn").limit(1).collect()[0]
    )
    src.delete_eq_mor(
        spark,
        spark.createDataFrame([(held["ts"],)], "ts long"),
        ["ts"],
    )
    cat._commit_pins({"events": src.metadata.current_snapshot_id})
    assert topk_rt_equals()  # promoted row came back from source
    # mixed tail: inserts for untouched keys + the deletes above
    src = cat.table("events")
    src.append(
        spark.createDataFrame([(4, 0, 400), (4, 1, 401)], "k long, v long, ts long")
    )
    cat._commit_pins({"events": src.metadata.current_snapshot_id})
    assert topk_rt_equals()
    # cache hygiene (round-12 ADVICE fix): each bounded-merge read
    # pins its cdc/del-key frames, the NEXT read drains the previous
    # read's pins, and an explicit release empties the registry — so
    # repeated realtime reads never accumulate cached blocks
    from java_iceberg_table_spark.table import maintained as mt

    assert 0 < len(mt._REALTIME_PINS) <= 2
    released = mt.release_realtime_pins()
    assert released >= 1 and not mt._REALTIME_PINS
    assert topk_rt_equals()  # reads still serve after the release


def test_read_realtime_cursor_expired_falls_back(spark, cat):
    from java_iceberg_table_spark.table.maintained import read_realtime

    create_maintained_agg(cat, spark, "sums", "events", "k", "v")
    src = cat.table("events")
    for b in range(3):
        src.append(
            spark.createDataFrame([(b, b, 200 + b)], "k long, v long, ts long")
        )
    # expire everything but the newest snapshot: the cursor's snapshot
    # is gone, so realtime must fall back to the full recompute
    src.expire_snapshots(older_than_ms=1 << 60, retain_last=1)
    cat._commit_pins({"events": src.metadata.current_snapshot_id})
    rt = read_realtime(cat, spark, "sums")
    rec = (
        cat.table("events").scan(spark)
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("v").alias("sv"),
        )
        .select(rt.columns)
    )
    assert rt.exceptAll(rec).isEmpty() and rec.exceptAll(rt).isEmpty()


def test_read_realtime_half_applied_fold_falls_back(spark, cat):
    """A crashed refresh (delete committed, cursor append missing)
    masks touched keys in the view; read_realtime must detect the live
    mv-refresh-del above the cursor append and serve the recompute
    instead of merging the masked view with the tail."""
    from java_iceberg_table_spark.table.maintained import read_realtime

    create_maintained_agg(cat, spark, "sums", "events", "k", "v")
    src = cat.table("events")
    src.append(
        spark.createDataFrame([(1, 500, 100)], "k long, v long, ts long")
    )
    cat._commit_pins({"events": src.metadata.current_snapshot_id})
    # simulate the crash window: the fold's delete lands, the append
    # does not (the chaos tests' del_only scenario)
    vt = cat.table("sums")
    vt.delete_eq_mor(
        spark,
        spark.createDataFrame([(1,)], "k long"),
        ["k"],
        extra_summary={"mv-refresh-del": 999},
    )
    rt = read_realtime(cat, spark, "sums")
    rec = (
        cat.table("events").scan(spark)
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("v").alias("sv"),
        )
        .select(rt.columns)
    )
    assert rt.exceptAll(rec).isEmpty() and rec.exceptAll(rt).isEmpty()
    # the refresh repairs the crash; realtime returns to the view path
    refresh_maintained(cat, spark, "sums")
    rt2 = read_realtime(cat, spark, "sums")
    assert rt2.exceptAll(rec).isEmpty() and rec.exceptAll(rt2).isEmpty()


def test_integral_measures_fold_exact_past_2_53(spark, cat):
    """Round-11 fix: integral source columns fold as LONG, so a
    maintained sum stays exact past 2^53 (a double fold silently
    rounds 2^53+1 to 2^53); float sources keep the double fold."""
    from pyspark.sql.types import DoubleType, LongType

    from java_iceberg_table_spark.table.maintained import read_realtime

    big = 1 << 53  # doubles cannot represent big+1
    src = cat.create_table(
        "ledger", spark.createDataFrame([], "k long, v long").schema
    )
    src.append(spark.createDataFrame([(1, big), (1, 1)], "k long, v long"))
    cat._commit_pins({"ledger": src.metadata.current_snapshot_id})
    vt = create_maintained_agg(cat, spark, "big_sums", "ledger", "k", "v")
    assert isinstance(vt.schema()["sv"].dataType, LongType)
    assert cat.read(spark, "big_sums").collect()[0]["sv"] == big + 1
    # incremental refresh folds the delta exactly too
    src = cat.table("ledger")
    src.append(spark.createDataFrame([(1, 1), (1, 1)], "k long, v long"))
    cat._commit_pins({"ledger": src.metadata.current_snapshot_id})
    # realtime merge of view + tail is exact before any refresh
    rt = read_realtime(cat, spark, "big_sums").collect()[0]
    assert rt["sv"] == big + 3 and rt["cnt"] == 4
    refresh_maintained(cat, spark, "big_sums")
    row = cat.read(spark, "big_sums").collect()[0]
    assert row["sv"] == big + 3 and row["cnt"] == 4
    # a float source still folds as double (back-compat rule)
    fsrc = cat.create_table(
        "fledger", spark.createDataFrame([], "k long, v double").schema
    )
    fsrc.append(spark.createDataFrame([(1, 0.5)], "k long, v double"))
    cat._commit_pins({"fledger": fsrc.metadata.current_snapshot_id})
    fvt = create_maintained_agg(cat, spark, "fsums", "fledger", "k", "v")
    assert isinstance(fvt.schema()["sv"].dataType, DoubleType)
    assert cat.read(spark, "fsums").collect()[0]["sv"] == 0.5


def test_topk_realtime_read_plans_without_spark_jobs(spark, cat):
    """Round-11: the top-k realtime read decides merge-vs-recompute
    from snapshot METADATA (ops in the cursor window), so constructing
    the read runs ZERO Spark jobs — the old cdc.isEmpty() probe cost
    one extra action per read. Pinned via a job group."""
    from java_iceberg_table_spark.table.maintained import read_realtime

    create_maintained_topk(
        cat, spark, "top_events", "events", "k", ["ts", "v"], 3
    )
    # insert-only tail: appends after the cursor, no refresh
    src = cat.table("events")
    src.append(
        spark.createDataFrame(
            [(9, 1, 5000), (9, 2, 5001)], "k long, v long, ts long"
        )
    )
    cat._commit_pins({"events": src.metadata.current_snapshot_id})
    sc = spark.sparkContext
    sc.setJobGroup("rt_topk_read", "action-count pin")
    try:
        rt = read_realtime(cat, spark, "top_events")
    finally:
        jobs = sc.statusTracker().getJobIdsForGroup("rt_topk_read")
        sc.setJobGroup(None, None)
    assert list(jobs) == [], f"realtime read construction ran jobs: {jobs}"
    # and the merged read is exact
    rec = topk_frame(
        cat.table("events").scan(spark), "k", ["ts", "v"], 3
    ).select(rt.columns)
    assert rt.exceptAll(rec).isEmpty() and rec.exceptAll(rt).isEmpty()
    # a delete in the tail flips the metadata decision to recompute
    src.delete_eq_mor(
        spark, spark.createDataFrame([(5000,)], "ts long"), ["ts"]
    )
    cat._commit_pins({"events": src.metadata.current_snapshot_id})
    rt2 = read_realtime(cat, spark, "top_events")
    rec2 = topk_frame(
        cat.table("events").scan(spark), "k", ["ts", "v"], 3
    ).select(rt2.columns)
    assert rt2.exceptAll(rec2).isEmpty() and rec2.exceptAll(rt2).isEmpty()


def test_read_realtime_random_churn_schedules(spark, cat):
    """Read-side chaos (round 11): under a seeded random schedule of
    appends, MOR equality deletes, and occasional refreshes, BOTH
    realtime read kinds — the agg signed-tail merge and the top-k
    bounded touched-key merge — equal a from-scratch recompute after
    EVERY step, without a single repair write. Exercises the
    metadata-only insert-only decision, the bounded delete path, and
    tail windows that mix both directions."""
    import random

    from java_iceberg_table_spark.table.maintained import read_realtime

    create_maintained_topk(
        cat, spark, "top_events", "events", "k", ["ts", "v"], 3
    )
    create_maintained_agg(cat, spark, "sums", "events", "k", "v")
    rng = random.Random(23)

    def recompute_agg(rt_cols):
        return (
            cat.table("events").scan(spark)
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("cnt"), F.sum("v").alias("sv"))
            .select(rt_cols)
        )

    def both_exact() -> None:
        rt_t = read_realtime(cat, spark, "top_events")
        rec_t = topk_frame(
            cat.table("events").scan(spark), "k", ["ts", "v"], 3
        ).select(rt_t.columns)
        assert rt_t.exceptAll(rec_t).isEmpty()
        assert rec_t.exceptAll(rt_t).isEmpty()
        rt_a = read_realtime(cat, spark, "sums")
        rec_a = recompute_agg(rt_a.columns)
        assert rt_a.exceptAll(rec_a).isEmpty()
        assert rec_a.exceptAll(rt_a).isEmpty()

    next_ts = 10_000
    for step in range(8):
        src = cat.table("events")
        action = rng.choice(["append", "delete", "mixed", "refresh"])
        if action in ("append", "mixed"):
            rows = [
                (rng.randrange(7), rng.randrange(50), next_ts + i)
                for i in range(rng.randrange(1, 6))
            ]
            next_ts += 10
            src.append(
                spark.createDataFrame(rows, "k long, v long, ts long")
            )
        if action in ("delete", "mixed"):
            live_ts = [
                r["ts"]
                for r in src.scan(spark).select("ts").limit(50).collect()
            ]
            if live_ts:
                victims = rng.sample(live_ts, min(2, len(live_ts)))
                src.delete_eq_mor(
                    spark,
                    spark.createDataFrame([(t,) for t in victims], "ts long"),
                    ["ts"],
                )
        cat._commit_pins({"events": src.metadata.current_snapshot_id})
        if action == "refresh":
            refresh_maintained(cat, spark, "top_events")
            refresh_maintained(cat, spark, "sums")
        both_exact()
    # a final refresh catches both views up; reads become plain scans
    refresh_maintained(cat, spark, "top_events")
    refresh_maintained(cat, spark, "sums")
    both_exact()


def test_maintained_extrema_lifecycle(spark, cat):
    """MIN/MAX maintained view (round 11): inserts fold incrementally
    (least/greatest), deletes rebuild only the touched keys from
    source; keys whose every row is deleted leave the view; realtime
    reads merge exactly in both window shapes."""
    from java_iceberg_table_spark.table.maintained import (
        create_maintained_extrema,
        read_realtime,
    )

    create_maintained_extrema(cat, spark, "ext", "events", "k", "v")

    def equals_recompute() -> bool:
        mv = cat.table("ext").scan(spark).select("k", "mn", "mx")
        rec = (
            cat.table("events").scan(spark)
            .groupBy("k")
            .agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
        )
        return mv.exceptAll(rec).isEmpty() and rec.exceptAll(mv).isEmpty()

    def rt_equals() -> bool:
        rt = read_realtime(cat, spark, "ext")
        rec = (
            cat.table("events").scan(spark)
            .groupBy("k")
            .agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
            .select(rt.columns)
        )
        return rt.exceptAll(rec).isEmpty() and rec.exceptAll(rt).isEmpty()

    assert equals_recompute()
    # no-op refresh
    assert refresh_maintained(cat, spark, "ext")["refreshed"] is False
    # insert-only fold: new max for key 1, new key 9
    src = cat.table("events")
    src.append(
        spark.createDataFrame(
            [(1, 500, 100), (9, -7, 101)], "k long, v long, ts long"
        )
    )
    cat._commit_pins({"events": src.metadata.current_snapshot_id})
    assert rt_equals()  # realtime merge before any refresh
    res = refresh_maintained(cat, spark, "ext")
    assert res["refreshed"] and res["touched_keys"] == 2
    assert equals_recompute()
    row = {r["k"]: (r["mn"], r["mx"]) for r in
           cat.table("ext").scan(spark).collect()}
    assert row[1][1] == 500 and row[9] == (-7, -7)
    # delete the current MAX of key 1: touched-key rebuild demotes it
    src = cat.table("events")
    src.delete_eq_mor(
        spark, spark.createDataFrame([(100,)], "ts long"), ["ts"]
    )
    cat._commit_pins({"events": src.metadata.current_snapshot_id})
    assert rt_equals()  # bounded realtime merge under the tail delete
    assert refresh_maintained(cat, spark, "ext")["refreshed"]
    assert equals_recompute()
    row = {r["k"]: r["mx"] for r in cat.table("ext").scan(spark).collect()}
    assert row[1] != 500
    # a key fully deleted leaves the view
    src = cat.table("events")
    src.delete_eq_mor(
        spark, spark.createDataFrame([(101,)], "ts long"), ["ts"]
    )
    cat._commit_pins({"events": src.metadata.current_snapshot_id})
    assert rt_equals()
    assert refresh_maintained(cat, spark, "ext")["refreshed"]
    assert equals_recompute()
    assert cat.table("ext").scan(spark).filter(F.col("k") == 9).count() == 0
    # caught up: realtime is a plain scan; second refresh no-ops
    assert rt_equals()
    assert refresh_maintained(cat, spark, "ext")["refreshed"] is False


def test_extrema_sql_ddl(spark, cat):
    """CREATE MATERIALIZED VIEW extrema shape through Catalog.sql;
    wrong shapes refuse loudly."""
    from java_iceberg_table_spark.table.sql_dml import UnsupportedSQL

    res = cat.sql(
        spark,
        "CREATE MATERIALIZED VIEW ext AS "
        "SELECT k, MIN(v) AS mn, MAX(v) AS mx FROM events GROUP BY k",
    )
    assert res["statement"] == "create_materialized_view"
    assert res["kind"] == "extrema"
    src = cat.table("events")
    src.append(
        spark.createDataFrame([(0, 999, 200)], "k long, v long, ts long")
    )
    cat._commit_pins({"events": src.metadata.current_snapshot_id})
    cat.sql(spark, "REFRESH MATERIALIZED VIEW ext")
    got = {r["k"]: r["mx"] for r in cat.read(spark, "ext").collect()}
    assert got[0] == 999
    # realtime hint serves the extrema view too
    src.append(
        spark.createDataFrame([(0, 2000, 201)], "k long, v long, ts long")
    )
    cat._commit_pins({"events": src.metadata.current_snapshot_id})
    rt = cat.sql(
        spark, "SELECT /*+ REALTIME */ mx FROM ext WHERE k = 0"
    ).collect()[0]["mx"]
    assert rt == 2000
    mvs = {r["view_name"]: r["kind"] for r in
           cat.sql(spark, "SHOW MATERIALIZED VIEWS").collect()}
    assert mvs["ext"] == "extrema"
    for bad in (
        # different columns in MIN and MAX
        "CREATE MATERIALIZED VIEW e2 AS "
        "SELECT k, MIN(v) AS mn, MAX(ts) AS mx FROM events GROUP BY k",
        # wrong aliases
        "CREATE MATERIALIZED VIEW e2 AS "
        "SELECT k, MIN(v) AS lo, MAX(v) AS hi FROM events GROUP BY k",
        # MAX-only stays out of grammar
        "CREATE MATERIALIZED VIEW e2 AS "
        "SELECT k, MAX(v) AS mx FROM events GROUP BY k",
        # key != GROUP BY
        "CREATE MATERIALIZED VIEW e2 AS "
        "SELECT k, MIN(v) AS mn, MAX(v) AS mx FROM events GROUP BY ts",
    ):
        with pytest.raises(UnsupportedSQL):
            cat.sql(spark, bad)
