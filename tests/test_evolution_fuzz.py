"""Seeded randomized differential test: a random interleaving of
appends, renames, type widenings, MOR equality/predicate deletes, and
the avro format toggle, checked step-free against a driver-side pandas
model of the same operation sequence. This is the interaction net for
the schema-evolution read paths — any vintage-mapping, sequence-
semantics, or format-branch bug shows up as a row diff."""

from __future__ import annotations

import random

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from java_iceberg_table_spark.table import create_table


def _collect(spark, tbl, key_col, val_col):
    rows = tbl.scan(spark).collect()
    return sorted((int(r[key_col]), r[val_col]) for r in rows)


@pytest.mark.parametrize("seed", [7, 23, 91, 137, 211])
def test_randomized_evolution_differential(spark, tmp_path, seed):
    rng = random.Random(seed)
    root = str(tmp_path / f"t{seed}")
    tbl = create_table(
        root,
        StructType(
            [
                StructField("k", IntegerType(), False),
                StructField("v", StringType(), True),
            ]
        ),
        # lineage preservation rides along under every mutation; the
        # end-of-run invariant checks id uniqueness survived it all
        properties={"row.lineage": "preserve"},
    )
    # model state: list of (k, v); column names tracked separately
    model: list[tuple[int, str]] = []
    key_name, val_name = "k", "v"
    key_type = "int"
    next_k = 0
    renames_left = 2
    did_widen = False
    toggled_avro = False

    def append_batch(n, reuse_deleted=None):
        nonlocal next_k
        rows = []
        for _ in range(n):
            k = next_k
            next_k += 1
            rows.append((k, f"v{k}"))
        if reuse_deleted:
            rows.extend((k, f"re{k}") for k in reuse_deleted)
        sdf = spark.createDataFrame(
            rows, f"{key_name} {'long' if did_widen else key_type}, {val_name} string"
        )
        tbl.append(sdf)
        model.extend(rows)

    append_batch(rng.randint(3, 8))
    deleted_keys: list[int] = []
    # snapshot-id -> model state, for rollback steps (rollback is
    # metadata-only: the engine must restore EXACTLY this multiset)
    history: list[tuple[int, list[tuple[int, str]]]] = [
        (tbl.metadata.current_snapshot().snapshot_id, list(model))
    ]
    for step in range(10):
        op = rng.choice(
            [
                "append",
                "append",
                "eq_delete",
                "pred_delete",
                "rename",
                "widen",
                "avro",
                "compact",
                "zorder",
                "rewrite_deletes",
                "spec_evolve",
                "branch_wap",
                "rollback",
                "merge",
                "add_files",
                "cherry_pick",
            ]
        )
        if op == "append":
            # sometimes re-insert a previously eq-deleted key: sequence
            # semantics must let it survive
            reuse = (
                rng.sample(deleted_keys, min(2, len(deleted_keys)))
                if deleted_keys and rng.random() < 0.5
                else None
            )
            append_batch(rng.randint(2, 6), reuse)
            if reuse:
                deleted_keys = [k for k in deleted_keys if k not in reuse]
        elif op == "eq_delete" and model:
            victims = rng.sample([k for k, _ in model], min(3, len(model)))
            keys = spark.createDataFrame(
                [(int(k),) for k in victims],
                f"{key_name} {'long' if did_widen else key_type}",
            )
            tbl.delete_eq_mor(spark, keys, [key_name])
            model = [(k, v) for k, v in model if k not in victims]
            deleted_keys.extend(victims)
        elif op == "pred_delete" and model:
            cut = rng.randint(0, next_k)
            tbl.delete_where_mor(spark, [(key_name, "<", cut)])
            removed = [k for k, _ in model if k < cut]
            model = [(k, v) for k, v in model if k >= cut]
            deleted_keys.extend(removed)
        elif op == "rename" and renames_left:
            renames_left -= 1
            if rng.random() < 0.5:
                new = val_name + "x"
                tbl.rename_column(val_name, new)
                val_name = new
            else:
                new = key_name + "x"
                try:
                    tbl.rename_column(key_name, new)
                    key_name = new
                except ValueError:
                    # key is the current partition source (spec_evolve
                    # step): renaming it is refused — rename val instead
                    new = val_name + "x"
                    tbl.rename_column(val_name, new)
                    val_name = new
        elif op == "widen" and not did_widen:
            tbl.widen_column(key_name, "long")
            did_widen = True
        elif op == "avro" and not toggled_avro:
            tbl.set_properties({"write.format.default": "avro"})
            toggled_avro = True
        elif op == "spec_evolve":
            # metadata-only: future appends bucket under the new spec,
            # existing entries keep pruning under their own spec_id
            from java_iceberg_table_spark.table import (
                bucket,
                day,
                hour,
                identity,
                truncate,
            )

            choice = rng.choice(
                ["truncate", "bucket", "identity", "day", "hour", "none"]
            )
            new_spec = {
                "truncate": lambda: truncate(key_name, rng.choice([4, 8])),
                "bucket": lambda: bucket(key_name, rng.choice([2, 3, 4])),
                "identity": lambda: identity(key_name),
                # temporal over the integral key read as epoch-µs (the
                # engine's long convention): exercises the monotonic
                # bucketless transform through every read path
                "day": lambda: day(key_name),
                "hour": lambda: hour(key_name),
                "none": lambda: None,
            }[choice]()
            tbl.update_partition_spec(new_spec)
        elif op == "branch_wap":
            # write-audit-publish within one step: stage an append on a
            # branch, then publish (rows land) or discard (they don't);
            # main-table reads must never see unpublished rows
            name = f"wap{step}"
            tbl.create_branch(name)
            rows = [(next_k + i, f"b{next_k + i}") for i in range(rng.randint(1, 4))]
            next_k += len(rows)
            sdf = spark.createDataFrame(
                rows,
                f"{key_name} {'long' if did_widen else key_type}, {val_name} string",
            )
            tbl.append(sdf, branch=name)
            assert _collect(spark, tbl, key_name, val_name) == sorted(model), (
                f"seed={seed} step={step} staged branch rows leaked into main"
            )
            if rng.random() < 0.5:
                tbl.publish_branch(name)
                model.extend(rows)
            tbl.drop_ref(name)  # discard (or retire the published ref)
        elif op == "rollback" and len(history) > 1:
            cur_id = tbl.metadata.current_snapshot().snapshot_id
            cands = [(s, m) for s, m in history[:-1] if s != cur_id]
            if cands:
                sid, saved = rng.choice(cands)
                tbl.rollback_to(sid)
                model = list(saved)
        elif op == "merge" and model:
            # MERGE INTO row delta: update some existing keys, insert
            # fresh ones — one atomic commit whose eq-delete must mask
            # exactly the superseded versions, never its replacements
            upd = rng.sample([k for k, _ in model], min(2, len(model)))
            ins = [next_k, next_k + 1]
            next_k += 2
            rows = [(k, f"m{k}") for k in upd] + [(k, f"i{k}") for k in ins]
            sdf = spark.createDataFrame(
                rows,
                f"{key_name} {'long' if did_widen else key_type}, {val_name} string",
            )
            tbl.merge_into(spark, sdf, [key_name], update="all", insert=True)
            model = [(k, v) for k, v in model if k not in upd] + rows
        elif op == "add_files" and tbl.transform is None:
            # metadata-only import of externally-written parquet; the
            # single-bucket rule makes partitioned imports fiddly to
            # randomize, so the step only fires while unpartitioned
            rows = [(next_k + i, f"x{next_k + i}") for i in range(rng.randint(1, 4))]
            next_k += len(rows)
            # post-widen the table key is long; an int-typed file must
            # still import (native parquet upcast)
            ktype = (
                rng.choice(["int", "long"]) if did_widen else "int"
            )
            ext = str(tmp_path / f"ext{seed}_{step}")
            spark.createDataFrame(
                rows, f"{key_name} {ktype}, {val_name} string"
            ).coalesce(1).write.parquet(ext)
            import glob as _g

            tbl.add_files(_g.glob(ext + "/*.parquet"))
            model.extend(rows)
        elif op == "cherry_pick":
            # stage on a branch, let main move, then cherry-pick the
            # staged snapshot onto the moved head
            name = f"cp{step}"
            tbl.create_branch(name)
            rows = [(next_k + i, f"c{next_k + i}") for i in range(rng.randint(1, 3))]
            next_k += len(rows)
            sdf = spark.createDataFrame(
                rows,
                f"{key_name} {'long' if did_widen else key_type}, {val_name} string",
            )
            staged = tbl.append(sdf, branch=name)
            if rng.random() < 0.5:
                append_batch(rng.randint(1, 3))  # main moves first
            tbl.cherry_pick(staged.snapshot_id)
            model.extend(rows)
            tbl.drop_ref(name)
        elif op == "compact" and model:
            # content-invariant maintenance: the model must not move
            tbl.compact_data_files(spark)
        elif op == "zorder" and model:
            tbl.rewrite_clustered(spark, [key_name], n_files=4)
        elif op == "rewrite_deletes":
            tbl.rewrite_deletes(spark)
        # engine state must equal the model after EVERY step
        assert _collect(spark, tbl, key_name, val_name) == sorted(model), (
            f"seed={seed} step={step} op={op}"
        )
        cur = tbl.metadata.current_snapshot()
        if cur is not None:
            history.append((cur.snapshot_id, list(model)))
    # the CONNECTOR is an independent read implementation (pyarrow
    # alignment + executor-side MOR masking, vs Spark's parquet reader
    # + DataFrame anti-joins): it must agree with the model too —
    # pending deletes, renames, widenings, and format mix included
    from java_iceberg_table_spark.sources import register_engine_datasource

    register_engine_datasource(spark)
    conn = spark.read.format("engine_table").option("root", root).load()
    got = sorted((int(r[key_name]), r[val_name]) for r in conn.collect())
    assert got == sorted(model), f"connector read diverges (seed={seed})"
    # FILTERED connector read: pushed predicates reach the parquet
    # read (row-level pyarrow pushdown) and must compose with MOR
    # masks, rename vintages, and the avro branch (which skips
    # pushdown) — the classic composition surface for silent row loss
    if model:
        cut = sorted(k for k, _ in model)[len(model) // 2]
        fgot = sorted(
            (int(r[key_name]), r[val_name])
            for r in conn.filter(F.col(key_name) >= cut).collect()
        )
        assert fgot == sorted((k, v) for k, v in model if k >= cut), (
            f"filtered connector read diverges (seed={seed}, cut={cut})"
        )
    # and materializing the pending deletes changes nothing
    tbl.rewrite_deletes(spark)
    assert _collect(spark, tbl, key_name, val_name) == sorted(model)
    # row-lineage invariant after the whole mutation sequence: every
    # non-null _row_id unique (appends/imports/cherry-picks assign
    # from disjoint ranges; preserve-mode rewrites carry ids; merge
    # replacement files legitimately read NULL), and the lineage scan
    # sees exactly the model's rows
    lin = tbl.scan_with_lineage(spark).select(key_name, "_row_id").collect()
    assert len(lin) == len(model), f"lineage scan row count (seed={seed})"
    ids = [r["_row_id"] for r in lin if r["_row_id"] is not None]
    assert len(ids) == len(set(ids)), f"duplicate _row_id (seed={seed})"
