"""Manifest-level Bloom index: no false negatives, useful FP rate,
plan_files integration, manifest round trip."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from java_iceberg_table_spark.table import create_table
from java_iceberg_table_spark.table import load_table as open_table
from java_iceberg_table_spark.table.bloom_index import (
    bloom_may_contain,
    build_file_blooms,
    sized_bits,
)


@pytest.fixture(scope="module")
def bloom_table(spark, sf_dir):
    from java_iceberg_table_spark.fixtures import load_table

    base = tempfile.mkdtemp(prefix="bloom_test_")
    root = base + "/t"
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    tbl = create_table(
        root, orders.schema, properties={"write.bloom.column": "o_orderkey"}
    )
    tbl.append(orders.repartition(4))
    keys = {r[0] for r in orders.select("o_orderkey").collect()}
    yield tbl, keys
    import shutil

    shutil.rmtree(base, ignore_errors=True)


def test_sized_bits_pow2_and_floor():
    assert sized_bits(1) == 1024
    assert sized_bits(500) == 8192  # 500*10 -> next pow2
    assert sized_bits(0) == 1024


def test_no_false_negatives(spark, bloom_table):
    tbl, keys = bloom_table
    entries = tbl.plan_files()
    assert all("bloom" in e for e in entries)
    # every present key must survive planning (bloom can't drop it)
    sample = sorted(keys)[:: max(1, len(keys) // 50)][:50]
    for k in sample:
        hit = tbl.plan_files([("o_orderkey", "=", int(k))])
        assert hit, f"present key {k} pruned away"
        # and the scan returns its rows
    k = sample[0]
    expect = len([x for x in keys if x == k])
    assert tbl.scan(spark, [("o_orderkey", "=", int(k))]).count() >= 1


def test_absent_keys_prune_most_files(spark, sf_dir):
    # fixture orderkeys are dense, so build over a SPARSE derived key
    # (2*o_orderkey): every odd value is an in-range absent key that
    # min/max CANNOT prune — only the bloom can. ~1% FP per file ->
    # matched-file rate across 200 probes well under 10%.
    from java_iceberg_table_spark.fixtures import load_table

    base = tempfile.mkdtemp(prefix="bloom_sparse_")
    root = base + "/t"
    try:
        orders = load_table(spark, sf_dir, "orders").select(
            (F.col("o_orderkey") * 2).alias("k"), "o_totalprice"
        )
        tbl = create_table(
            root, orders.schema, properties={"write.bloom.column": "k"}
        )
        tbl.append(orders.repartition(4))
        n_all = len(tbl.plan_files())
        lo = min(r[0] for r in tbl.scan(spark).agg(F.min("k")).collect())
        absent = [int(lo) + 1 + 2 * i for i in range(200)]  # odd = absent
        matched = sum(len(tbl.plan_files([("k", "=", v)])) for v in absent)
        assert matched <= 0.1 * len(absent) * n_all
    finally:
        import shutil

        shutil.rmtree(base, ignore_errors=True)


def test_present_key_prunes_other_files(bloom_table):
    tbl, keys = bloom_table
    n_all = len(tbl.plan_files())
    assert n_all >= 2
    k = int(min(keys))
    n_hit = len(tbl.plan_files([("o_orderkey", "=", k)]))
    assert 1 <= n_hit < n_all


def test_bloom_survives_manifest_roundtrip(bloom_table):
    tbl, keys = bloom_table
    # reopen from disk: the bloom must come back from the manifest JSON
    reopened = open_table(tbl.root)
    e = reopened.plan_files()[0]
    b = e["bloom"]
    assert b["column"] == "o_orderkey" and len(b["words"]) == b["bits"] // 64
    # probe parity after JSON round trip
    k = next(iter(keys))
    assert bloom_may_contain(b, int(k)) in (True, False)


def test_build_probe_hash_parity(spark):
    # the Spark build side and the Python probe side must agree on
    # every inserted value (CRC32 string parity)
    import os

    base = tempfile.mkdtemp(prefix="bloom_parity_")
    path = os.path.join(base, "f.parquet")
    vals = list(range(0, 5000, 7)) + [10**12 + 3]
    spark.createDataFrame([(v,) for v in vals], "k long").coalesce(
        1
    ).write.parquet(path)
    import glob

    f = glob.glob(os.path.join(path, "*.parquet"))[0]
    blooms = build_file_blooms(spark, {f: len(vals)}, "k")
    b = blooms[f]
    assert all(bloom_may_contain(b, v) for v in vals)
    import shutil

    shutil.rmtree(base, ignore_errors=True)


def test_root_containing_data_segment(spark, sf_dir):
    # A table rooted under a path that itself contains a /data/
    # component (e.g. <tmp>/data/warehouse/t) must still key its
    # blooms by the LAST data/ segment — the one the scan side
    # extracts. A first-segment anchor would build keys like
    # "data/warehouse/t/data/part-..." while the Spark mirror and
    # table._file_key_col extract "data/part-...": every probe would
    # then see an all-zero bloom and present keys would be pruned
    # away (silent missing rows).
    import os

    from java_iceberg_table_spark.fixtures import load_table
    from java_iceberg_table_spark.table.bloom_index import _rel_key

    assert _rel_key("/x/data/warehouse/t/data/f.parquet") == "data/f.parquet"

    base = tempfile.mkdtemp(prefix="bloom_dataroot_")
    root = os.path.join(base, "data", "warehouse", "t")
    try:
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        tbl = create_table(
            root, orders.schema, properties={"write.bloom.column": "o_orderkey"}
        )
        tbl.append(orders.repartition(4))
        entries = tbl.plan_files()
        assert entries and all("bloom" in e for e in entries)
        # blooms must be non-trivial (a key mismatch yields all-zero words)
        assert any(any(w != 0 for w in e["bloom"]["words"]) for e in entries)
        keys = sorted(r[0] for r in orders.select("o_orderkey").collect())
        for k in keys[:: max(1, len(keys) // 25)][:25]:
            assert tbl.plan_files([("o_orderkey", "=", int(k))]), (
                f"present key {k} pruned away under /data/-containing root"
            )
        # absent keys must still prune (the bloom is real, not a
        # survive-everything fallback)
        n_all = len(entries)
        absent = [int(keys[-1]) + 10**9 + i for i in range(50)]
        matched = sum(
            len(tbl.plan_files([("o_orderkey", "=", v)])) for v in absent
        )
        assert matched <= 0.1 * len(absent) * n_all
    finally:
        import shutil

        shutil.rmtree(base, ignore_errors=True)


def test_distributed_plan_path_honors_bloom(spark, bloom_table):
    tbl, keys = bloom_table
    k = int(min(keys))
    # force the distributed manifest scan and compare with the driver
    # loop: identical survivor sets for present AND absent probes
    def both(filters):
        drv = {e["path"] for e in tbl.plan_files(filters)}
        dist = {
            e["path"]
            for e in tbl.plan_files(
                filters, spark=spark, distributed_threshold_bytes=0
            )
        }
        return drv, dist

    for filters in ([("o_orderkey", "=", k)], [("o_orderkey", ">", k)]):
        drv, dist = both(filters)
        assert drv == dist, f"driver/distributed divergence for {filters}"
    n_all = len(tbl.plan_files())
    _, dist_hit = both([("o_orderkey", "=", k)])
    assert 1 <= len(dist_hit) < n_all  # bloom pruned in the dist path too


def test_blooms_survive_rewrites(spark, sf_dir):
    # compaction and z-order rewrites must re-attach blooms to the new
    # files — otherwise a maintenance pass silently regresses
    # point-lookup pruning
    from java_iceberg_table_spark.fixtures import load_table

    base = tempfile.mkdtemp(prefix="bloom_rw_")
    root = base + "/t"
    try:
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
        tbl = create_table(
            root, orders.schema, properties={"write.bloom.column": "o_orderkey"}
        )
        tbl.append(orders.repartition(4))
        tbl.rewrite_clustered(spark, ["o_orderkey", "o_custkey"], n_files=4)
        entries = tbl.plan_files()
        assert entries and all("bloom" in e for e in entries)
        k = int(orders.agg(F.min("o_orderkey")).collect()[0][0])
        # after z-order, min/max already prunes on o_orderkey; the
        # bloom must still answer present/absent correctly
        assert tbl.scan(spark, [("o_orderkey", "=", k)]).count() >= 1
    finally:
        import shutil

        shutil.rmtree(base, ignore_errors=True)
