"""Unit/property tests for the LLM-pipeline operators that the DuckDB
oracle can't check (approximate ops, multimodal plumbing)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from java_iceberg_table_spark.fixtures import load_table
from java_iceberg_table_spark.operators.dedup import (
    minhash_near_duplicates,
    simhash_near_duplicates,
    simhash_signatures,
)
from java_iceberg_table_spark.operators.multimodal import (
    FEATURE_DIM,
    extract_features,
    frame_sample_plan,
    synthetic_media,
)
from java_iceberg_table_spark.operators.similarity import (
    brute_force_topk,
    label_centroids,
    lsh_topk,
)
from java_iceberg_table_spark.operators.text import language_id, train_char_profiles


def test_simhash_planted_duplicates(spark):
    rows = [
        (1, "spark query engine with hash join and window functions"),
        (2, "spark query engine with hash join and window functions"),  # identical
        (3, "spark query engine with hash join and window aggregates"),  # 1-token change
        (4, "completely different text about bananas apples and oranges pears"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sigs = {r["id"]: r["simhash"] for r in simhash_signatures(df, "doc_id", "text").collect()}
    assert sigs[1] == sigs[2]  # identical docs -> identical signature
    h13 = bin(sigs[1] ^ sigs[3]).count("1")
    h14 = bin(sigs[1] ^ sigs[4]).count("1")
    assert 0 < h13 < h14  # near-dup closer than unrelated doc
    # pigeonhole blocking must find every pair within the budget
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in simhash_near_duplicates(df, "doc_id", "text", max_hamming=h13).collect()
    }
    assert pairs[(1, 2)] == 0
    assert pairs[(1, 3)] == h13
    assert (1, 4) not in pairs and (2, 4) not in pairs


def test_minhash_lsh_equals_exact_on_planted(spark):
    rows = [
        (1, "a b c d e f g h i j"),
        (2, "a b c d e f g h i k"),  # jaccard 9/11 = 0.818
        (3, "a b c d e f g h i j"),  # exact dup of 1
        (4, "z y x w v u t s r q"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): round(r["jaccard"], 4)
        for r in minhash_near_duplicates(df, "doc_id", "text", threshold=0.8).collect()
    }
    assert got[(1, 3)] == 1.0
    assert got[(1, 2)] == round(9 / 11, 4)
    assert (1, 4) not in got


def test_lsh_topk_recall_vs_bruteforce(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(emb, queries, k=5).collect()
    approx = lsh_topk(emb, queries, k=5, dim=64).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.5, f"LSH recall too low: {recall}"
    # determinism: same seed -> same result
    approx2 = {(r["query_id"], r["neighbor_id"]) for r in lsh_topk(emb, queries, k=5, dim=64).collect()}
    assert approx_set == approx2


def test_lsh_topk_pairs_unique(spark, sf_dir):
    """The round-14 distinct() removal in lsh_topk/ivf_topk rests on
    (query, neighbor) pairs being unique BEFORE ranking: one bucket
    per corpus row x distinct probe masks per query. Assert it on the
    widest probe the registered rows use."""
    from java_iceberg_table_spark.operators.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    for approx in (
        lsh_topk(emb, queries, k=10**9, dim=64, probe_hamming=3),
        ivf_topk(emb, queries, k=10**9, n_centroids=8, nprobe=6),
    ):
        total = approx.count()
        distinct = approx.select("query_id", "neighbor_id").distinct().count()
        assert total == distinct, f"{total} scored rows, {distinct} unique pairs"


def test_ann_selfcheck_direct_equivalence(spark, sf_dir):
    """_ann_selfcheck_direct == _ann_selfcheck(annotate_recall(...))
    on real, empty-approx, and partial-approx inputs (the shapes the
    ANN rows grade through)."""
    from java_iceberg_table_spark.operators.similarity import annotate_recall
    from java_iceberg_table_spark.queries.llm_ops import (
        _ann_selfcheck,
        _ann_selfcheck_direct,
        _ann_selfcheck_lit,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(emb, queries, k=5)
    kth_rows = [
        (r["query_id"], float(r["kth"]), int(r["n"]))
        for r in exact.groupBy("query_id")
        .agg(F.min("sim").alias("kth"), F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    full = lsh_topk(emb, queries, k=5, dim=64, probe_hamming=3)
    empty = full.filter(F.lit(False))
    partial = full.filter(F.col("query_id") < 5)
    for approx in (full, empty, partial):
        want = _ann_selfcheck(annotate_recall(approx, exact, k=5), k=5).collect()
        got = _ann_selfcheck_direct(approx, exact, k=5).collect()
        lit = _ann_selfcheck_lit(approx, kth_rows, k=5).collect()
        assert [tuple(r) for r in want] == [tuple(r) for r in got]
        assert [tuple(r) for r in want] == [tuple(r) for r in lit]
    # empty exact side: all three report (0, k, false)
    want = _ann_selfcheck(
        annotate_recall(full, exact.filter(F.lit(False)), k=5), k=5
    ).collect()
    lit = _ann_selfcheck_lit(full, [], k=5).collect()
    assert [tuple(r) for r in want] == [tuple(r) for r in lit]


def test_ann_selfcheck_onejob_equivalence(spark, sf_dir):
    """_ann_selfcheck_onejob(candidates) == _ann_selfcheck_lit(topk)
    — the round-15 prepared rows (h8bp/h8cp) grade the self-check
    summary straight off the UNRANKED candidate frame, skipping the
    per-query ranking window; this pins the value identity on full,
    empty, and partial candidate inputs for BOTH index families at
    the registered rows' exact knobs."""
    from java_iceberg_table_spark.operators.similarity import (
        ivf_candidates,
        lsh_candidates,
    )
    from java_iceberg_table_spark.queries.llm_ops import (
        _ann_selfcheck_lit,
        _ann_selfcheck_onejob,
    )
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = brute_force_topk(emb, queries, k=5)
    kth_rows = [
        (r["query_id"], float(r["kth"]), int(r["n"]))
        for r in exact.groupBy("query_id")
        .agg(F.min("sim").alias("kth"), F.count(F.lit(1)).alias("n"))
        .collect()
    ]
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    for cands in (
        lsh_candidates(emb, queries, dim=64, num_planes=4, probe_hamming=3),
        ivf_candidates(emb, queries, n_centroids=8, nprobe=6, iters=3),
    ):
        for cc in (
            cands,
            cands.filter(F.lit(False)),
            cands.filter(F.col("query_id") < 3),
        ):
            topk = cc.withColumn("rn", F.row_number().over(w).cast("long")).filter(
                F.col("rn") <= 5
            )
            want = _ann_selfcheck_lit(topk, kth_rows, k=5).collect()
            got = _ann_selfcheck_onejob(cc, kth_rows, k=5).collect()
            assert [tuple(r) for r in want] == [tuple(r) for r in got]
    # empty grading constants: both report (0, k, false)
    cands = lsh_candidates(emb, queries, dim=64)
    want = _ann_selfcheck_lit(cands, [], k=5).collect()
    got = _ann_selfcheck_onejob(cands, [], k=5).collect()
    assert [tuple(r) for r in want] == [tuple(r) for r in got]


def test_label_centroids_matches_sql(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    cents = label_centroids(emb, "label", "embedding", dim=64).collect()
    expected = {
        r["label"]: (r["c0"], r["c1"])
        for r in emb.groupBy("label")
        .agg(
            F.avg(F.col("embedding").getItem(0).cast("double")).alias("c0"),
            F.avg(F.col("embedding").getItem(1).cast("double")).alias("c1"),
        )
        .collect()
    }
    for r in cents:
        c = r["centroid"]
        assert len(c) == 64
        e0, e1 = expected[r["label"]]
        assert abs(c[0] - e0) < 1e-9 and abs(c[1] - e1) < 1e-9


def test_multimodal_feature_extraction(spark):
    media = synthetic_media(spark, n=30)
    feats = extract_features(media).collect()
    assert len(feats) == 30
    for r in feats:
        assert len(r["feature"]) == FEATURE_DIM
        assert r["n_bytes"] > 0
        assert all(0.0 <= v <= 1.0 for v in r["feature"])
    # determinism
    again = extract_features(media).collect()
    assert sorted((r["media_id"], tuple(r["feature"])) for r in again) == sorted(
        (r["media_id"], tuple(r["feature"])) for r in feats
    )


def test_frame_sample_plan_metadata_only(spark):
    media = synthetic_media(spark, n=30)
    plan = frame_sample_plan(media, every_n=10)
    rows = plan.collect()
    assert all(r["frame_idx"] % 10 == 0 for r in rows)
    videos = {r["media_id"] for r in media.filter(F.col("media_type") == "video").collect()}
    assert {r["media_id"] for r in rows} == videos
    # the plan must not carry the binary column
    assert "content" not in plan.columns


def test_language_id_deterministic_and_total(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    profiles = train_char_profiles(docs, "lang", "text", n=2)
    pred = language_id(docs, profiles, "doc_id", "text", n=2)
    n_docs = docs.count()
    assert pred.count() == n_docs  # every doc classified exactly once
    langs = {r["lang"] for r in docs.select("lang").distinct().collect()}
    assert {r["predicted_lang"] for r in pred.collect()} <= langs


def test_ivf_topk_recall_vs_bruteforce(spark, sf_dir):
    from java_iceberg_table_spark.operators.similarity import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(emb, queries, k=5).collect()
    approx = ivf_topk(emb, queries, k=5, n_centroids=16, nprobe=4).collect()
    exact_set = {(r["query_id"], r["neighbor_id"]) for r in exact}
    approx_set = {(r["query_id"], r["neighbor_id"]) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.5, f"IVF recall too low: {recall}"
    # every reported sim is the true cosine (re-rank is exact): any
    # (query, neighbor) pair also present in exact must agree on sim
    exact_sims = {(r["query_id"], r["neighbor_id"]): r["sim"] for r in exact}
    for r in approx:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_sims:
            assert abs(r["sim"] - exact_sims[key]) < 1e-9
    # determinism: seeded init + deterministic argmin -> same result
    approx2 = {
        (r["query_id"], r["neighbor_id"])
        for r in ivf_topk(emb, queries, k=5, n_centroids=16, nprobe=4).collect()
    }
    assert approx_set == approx2


def test_ivf_cells_partition_corpus(spark, sf_dir):
    """The inverted file is a partition of the corpus: every vector in
    exactly one cell, cells reasonably balanced (no empty-cell
    collapse), centroids normalized."""
    from java_iceberg_table_spark.operators.similarity import ivf_index

    emb = load_table(spark, sf_dir, "embeddings")
    assigned, cents = ivf_index(emb, n_centroids=8, iters=2)
    total = emb.count()
    assert assigned.count() == total
    assert assigned.select("id").distinct().count() == total
    sizes = [r["c"] for r in assigned.groupBy("cluster").agg(F.count(F.lit(1)).alias("c")).collect()]
    assert len(sizes) >= 2  # k-means did not collapse to one cell
    assert max(sizes) <= total  # sanity
    from java_iceberg_table_spark.operators.similarity import norm_expr
    norms = [r["n"] for r in cents.select(norm_expr("cvec").alias("n")).collect()]
    assert all(abs(n - 1.0) < 1e-9 for n in norms)


def test_connected_components_chain_and_cliques(spark):
    from java_iceberg_table_spark.operators.dedup import connected_components

    # a 6-node chain (diameter 5, forces multiple propagation rounds),
    # a triangle, and an isolated edge
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6),
         (10, 11), (11, 12), (10, 12),
         (20, 21)],
        "id_a long, id_b long",
    )
    got = {r["id"]: r["comp"] for r in connected_components(edges).collect()}
    assert all(got[i] == 1 for i in range(1, 7))
    assert all(got[i] == 10 for i in (10, 11, 12))
    assert got[20] == 20 and got[21] == 20


def test_greedy_packing_semantics(spark):
    """First-fit-sequential: order by id, new bin when budget would
    overflow, oversized docs get their own bin (no infinite loop)."""
    from java_iceberg_table_spark.operators.packing import pack_assignments

    rows = [("g", i, t) for i, t in enumerate([100, 300, 200, 512, 600, 1, 1])]
    df = spark.createDataFrame(rows, "src string, doc_id long, tok long")
    got = {
        r["doc_id"]: r["bin"]
        for r in pack_assignments(df, "src", "doc_id", "tok", budget=512).collect()
    }
    # 100+300 = 400 fits; +200 overflows -> bin 2; 512 exactly fills bin 3
    # (200+512 > 512); 600 oversized -> own bin 4; 1+1 -> bin 5
    assert got == {0: 1, 1: 1, 2: 2, 3: 3, 4: 4, 5: 5, 6: 5}


def test_packing_groups_independent(spark):
    """Bins never span groups; per-group totals are preserved."""
    from java_iceberg_table_spark.operators.packing import pack_summary

    rows = [("a", 1, 400), ("a", 2, 400), ("b", 3, 50), ("b", 4, 50)]
    df = spark.createDataFrame(rows, "src string, doc_id long, tok long")
    got = {r["group_key"]: r.asDict() for r in pack_summary(df, "src", "doc_id", "tok", 512).collect()}
    assert got["a"]["n_bins"] == 2 and got["a"]["total_tokens"] == 800
    assert got["b"]["n_bins"] == 1 and got["b"]["max_bin_tokens"] == 100


def test_bloom_no_false_negatives(spark):
    """Every reference member probes positive (the property that makes
    prefilter + exact verify equal the exact join); false-positive
    rate stays near the theoretical bound."""
    from java_iceberg_table_spark.operators.bloom import bloom_build_bits, bloom_probe

    ref = spark.createDataFrame([(f"key{i}",) for i in range(50)], "v string")
    other = spark.createDataFrame([(f"miss{i}",) for i in range(2000)], "v string")
    bits = bloom_build_bits(ref, F.col("v"), m=16384, k=5)
    assert ref.filter(bloom_probe(bits, F.col("v"), 16384, 5)).count() == 50
    fp = other.filter(bloom_probe(bits, F.col("v"), 16384, 5)).count()
    # ~(1 - e^(-kn/m))^k ~ 3e-9 at n=50; allow slack for hash clustering
    assert fp <= 2


def test_chunk_dedup_counts(spark):
    """Planted 25-token docs sharing their first 20-token chunk."""
    from java_iceberg_table_spark.operators.dedup import chunk_dup_stats

    shared = " ".join(f"w{i}" for i in range(20))
    rows = [
        (1, shared + " a b c d e"),
        (2, shared + " f g h i j"),
        (3, " ".join(f"u{i}" for i in range(25))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = chunk_dup_stats(df, "doc_id", "text", chunk_tokens=20).collect()[0].asDict()
    # chunks: doc1 [shared, tail1], doc2 [shared, tail2], doc3 [c1, c2]
    assert got["n_chunks_total"] == 6
    assert got["n_chunks_distinct"] == 5
    assert got["n_dup_chunks"] == 1
    assert got["n_docs_majority_dup"] == 0  # 1/2 chunks dup is not > 0.5


def test_bpe_merge_semantics(spark):
    """BPE on a corpus where the merge sequence is hand-computable:
    'aa ab' x3 + 'b' — chars a,a,</w> / a,b,</w> / b,</w>."""
    from java_iceberg_table_spark.operators.bpe import bpe_train

    rows = [(1, "aa ab aa"), (2, "ab aa b")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    # word freqs: aa:3, ab:2, b:1
    merges, syms, masses = bpe_train(df, "text", n_merges=3)
    # step 1: pairs (a,a):3, (a,</w>):3? no — 'aa'=[a,a,</w>]: (a,a),(a,</w>);
    # 'ab'=[a,b,</w>]: (a,b),(b,</w>); 'b'=[b,</w>]: (b,</w>)
    # counts: (a,a):3, (a,</w>):3, (a,b):2, (b,</w>):3 -> tie at 3,
    # lexicographic: (a,</w>) < (a,a) < (b,</w>)  ('<' on strings:
    # '</w>' starts with '<' (0x3c) < 'a' (0x61)) -> first merge (a,</w>)?
    # 'aa'=[a,a,</w>] has (a,</w>) once -> merge applies to aa and NOT ab.
    assert merges[0][0] == "a" and merges[0][1] == "</w>"
    assert merges[0][2] == 3
    # mass strictly decreases each step
    assert all(m2 < m1 for m1, m2 in zip(masses, masses[1:]))
    # leftmost-first non-overlap: 'aaa...' case
    df2 = spark.createDataFrame([(1, "aaaa aaa")], "doc_id long, text string")
    merges2, syms2, _ = bpe_train(df2, "text", n_merges=1)
    assert (merges2[0][0], merges2[0][1]) == ("a", "a")
    got = {tuple(r["syms"]) for r in syms2.collect()}
    # aaaa -> [aa, aa, </w>], aaa -> [aa, a, </w>]
    assert ("aa", "aa", "</w>") in got
    assert ("aa", "a", "</w>") in got


def test_semantic_dedup_keep_lowest_and_clean(spark):
    """Planted orthogonal clusters with exact copies: copies dropped,
    lowest id kept, kept set has no near-dup pair."""
    from java_iceberg_table_spark.operators.dedup import semantic_dedup

    e1 = [1.0, 0.0, 0.0, 0.0]
    e2 = [0.0, 1.0, 0.0, 0.0]
    e3 = [0.0, 0.0, 1.0, 0.0]
    rows = [
        (0, e1), (1, e1), (2, e1),   # triple dup -> keep 0
        (3, e2), (4, e2),            # pair dup   -> keep 3
        (5, e3),                     # unique     -> kept
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    kept = semantic_dedup(
        df, "vec_id", "embedding", threshold=0.99, n_clusters=3, iters=2
    )
    ids = sorted(r["id"] for r in kept.collect())
    assert ids == [0, 3, 5]


def test_cms_estimates_exact_without_collisions_and_never_undercounts(spark):
    from java_iceberg_table_spark.operators.sketch import cms_build, cms_estimate

    rows = [("a",)] * 100 + [("b",)] * 10 + [("c",)] * 1
    items = spark.createDataFrame(rows, "token string")
    sketch = cms_build(items, "token", depth=4, width=64)
    q = spark.createDataFrame([("a",), ("b",), ("c",), ("zzz",)], "token string")
    got = {
        r["token"]: r["cms_estimate"]
        for r in cms_estimate(sketch, q, "token", depth=4, width=64).collect()
    }
    # 3 items in 64 buckets x 4 rows: min-over-rows collision-free
    assert got["a"] == 100 and got["b"] == 10 and got["c"] == 1
    assert got["zzz"] >= 0  # absent item estimates only over-count
    # tiny width forces collisions: estimates may inflate, never deflate
    s2 = cms_build(items, "token", depth=2, width=2)
    got2 = {
        r["token"]: r["cms_estimate"]
        for r in cms_estimate(s2, q, "token", depth=2, width=2).collect()
    }
    assert got2["a"] >= 100 and got2["b"] >= 10 and got2["c"] >= 1


def test_bpe_merge_fold_matches_python_reference(spark):
    """The JVM-side merge fold (_merge_expr) vs a straightforward
    Python left-to-right merge, across 300 seeded-random symbol arrays
    and merge pairs (single Spark job, not per-example)."""
    import random

    from java_iceberg_table_spark.operators.bpe import _merge_expr

    rng = random.Random(7)
    alphabet = ["a", "b", "c", "</w>"]
    cases = []
    for i in range(300):
        syms = [rng.choice(alphabet) for _ in range(rng.randint(0, 12))]
        a, b = rng.choice(alphabet), rng.choice(alphabet)
        cases.append((i, syms, a, b))

    def ref_merge(syms, a, b):
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return out

    # group cases by (a, b) so each pair compiles one fold expression
    by_pair: dict[tuple, list] = {}
    for i, syms, a, b in cases:
        by_pair.setdefault((a, b), []).append((i, syms))
    for (a, b), rows in by_pair.items():
        df = spark.createDataFrame(rows, "i long, syms array<string>")
        got = {
            r["i"]: list(r["m"])
            for r in df.select("i", _merge_expr(a, b).alias("m")).collect()
        }
        for i, syms in rows:
            assert got[i] == ref_merge(syms, a, b), (syms, a, b)


def test_duplicated_span_stats_toy(spark):
    """8-token spans: doc 1 and 2 share an 8-token prefix (their first
    shingles collide); doc 3 is unique; doc 4 is too short to shingle;
    doc 5 repeats an 8-token phrase INSIDE itself (self-duplication
    counts — same contract as Lee et al.'s suffix dedup)."""
    from java_iceberg_table_spark.operators.dedup import duplicated_span_stats

    shared = "a b c d e f g h"
    rows = [
        (1, shared + " one two"),
        (2, shared + " three"),
        (3, "unique tokens here made just for doc three padded out"),
        (4, "too short"),
        (5, "x1 x2 x3 x4 x5 x6 x7 x8 x1 x2 x3 x4 x5 x6 x7 x8"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["id"]: (r["n_shingles"], r["n_dup_shingles"])
        for r in duplicated_span_stats(df, "doc_id", "text", k=8).collect()
    }
    # doc1: 10 tokens -> 3 shingles, only the prefix one duplicated
    assert got[1] == (3, 1)
    # doc2: 9 tokens -> 2 shingles, prefix duplicated
    assert got[2] == (2, 1)
    # doc3: 10 tokens -> 3 shingles, none duplicated
    assert got[3] == (3, 0)
    # doc4: below k -> absent
    assert 4 not in got
    # doc5: 16 tokens -> 9 shingles; the x1..x8 shingle occurs at
    # positions 1 and 9 -> 2 duplicated instances
    assert got[5] == (9, 2)


def test_incremental_near_duplicates_toy(spark):
    """Batch vs corpus: verbatim copy (fp path, jaccard 1.0), token-set
    near-dup above threshold (LSH+verify path), unique doc (no row),
    and batch-internal duplicates are NOT paired with each other."""
    from java_iceberg_table_spark.operators.dedup import (
        incremental_near_duplicates,
    )

    base = " ".join(f"w{i}" for i in range(40))
    near = " ".join(f"w{i}" for i in range(39)) + " zz"  # 39/41 = 0.951
    corpus = spark.createDataFrame(
        [(1, base), (2, "totally different content here")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(10, base), (11, near), (12, "nothing like anything"),
         (13, "nothing like anything")],
        "doc_id long, text string",
    )
    got = {
        (r["new_id"], r["corpus_id"]): r["jaccard"]
        for r in incremental_near_duplicates(
            corpus, batch, "doc_id", "text", threshold=0.9
        ).collect()
    }
    assert got[(10, 1)] == 1.0
    assert abs(got[(11, 1)] - 39 / 41) < 1e-9
    assert set(got) == {(10, 1), (11, 1)}  # 12/13 pair absent: b-vs-c only


def test_pq_codes_shape_and_adc_monotonicity(spark):
    """PQ contract: every vector encodes to exactly m in-range codes,
    and an exact duplicate of a corpus vector ranks itself first under
    ADC + re-rank (zero quantization distance to its own codes)."""
    import numpy as np

    from java_iceberg_table_spark.operators.similarity import pq_build, pq_topk

    rng = np.random.RandomState(7)
    vecs = rng.randn(40, 16).astype(float)
    vecs[1] = vecs[0]  # planted duplicate pair
    df = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    codes_df, books = pq_build(df, m=4, n_codes=8, iters=2)
    rows = codes_df.collect()
    assert len(rows) == 40
    for r in rows:
        assert len(r["code"]) == 4
        assert all(0 <= c < 8 for c in r["code"])
    q = df.filter(F.col("vec_id") == 0)
    top = pq_topk(codes_df, books, q, k=3, rerank=4).collect()
    best = min(top, key=lambda r: r["rank"])
    assert best["neighbor_id"] == 1 and abs(best["sim"] - 1.0) < 1e-6


def test_ivfpq_recall_and_candidate_fraction(spark, sf_dir):
    """IVF-PQ (round 8): recall@5 >= 0.9 vs brute force on the
    fixture, AND the ADC scan provably touches a small fraction of the
    corpus — the property flat PQ (h52) lacks and the reason the
    composition is the 100 TB ANN plan."""
    from java_iceberg_table_spark.operators.similarity import (
        ivfpq_build,
        ivfpq_candidate_fraction,
        ivfpq_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    index_df, cents, books = ivfpq_build(
        emb, n_centroids=8, m=16, n_codes=32, kmeans_iters=2, pq_iters=1
    )
    index_df = index_df.persist()
    try:
        # nprobe=6/8: the fixture corpora are near-isotropic (h8c's
        # measured knob), so recall tracks the probed fraction; a real
        # clustered corpus gets more centroids and narrower probes
        approx = ivfpq_topk(
            index_df, cents, books, queries, k=5, nprobe=6, rerank=20
        ).collect()
        exact = brute_force_topk(emb, queries, k=5).collect()
        exact_by_q: dict = {}
        for r in exact:
            exact_by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        got_by_q: dict = {}
        for r in approx:
            got_by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        recalls = [
            len(exact_by_q[q] & got_by_q.get(q, set())) / len(exact_by_q[q])
            for q in exact_by_q
        ]
        mean_recall = sum(recalls) / len(recalls)
        assert mean_recall >= 0.9, f"IVF-PQ recall too low: {mean_recall}"
        # reported sims are exact cosines (re-rank): agree with brute force
        exact_sims = {(r["query_id"], r["neighbor_id"]): r["sim"] for r in exact}
        for r in approx:
            key = (r["query_id"], r["neighbor_id"])
            if key in exact_sims:
                assert abs(r["sim"] - exact_sims[key]) < 1e-9
        # the scale property: candidate fraction ~ nprobe/n_centroids,
        # strictly below the full scan h52 pays
        frac = ivfpq_candidate_fraction(index_df, cents, queries, nprobe=6)
        assert frac < 0.95, f"ADC scan touched {frac:.2%} of the corpus"
        # and with fewer probes the gate tightens further
        frac1 = ivfpq_candidate_fraction(index_df, cents, queries, nprobe=1)
        assert frac1 < frac
    finally:
        index_df.unpersist()


def test_bmp_codec_roundtrip_and_rejection(spark):
    """Real BMP codec (round 8): decode(encode(px)) is bit-exact across
    every row-padding width, top-down BMPs parse, and corrupt inputs
    raise instead of returning garbage."""
    import numpy as np
    import struct
    import pytest as _pytest

    from java_iceberg_table_spark.operators.multimodal import (
        decode_bmp,
        encode_bmp,
    )

    rng = np.random.RandomState(7)
    for h, w in [(6, 10), (7, 11), (8, 12), (5, 13), (1, 1), (3, 16)]:
        px = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert (decode_bmp(encode_bmp(px)) == px).all()
    # top-down variant (negative height) must parse too
    px = rng.randint(0, 256, size=(4, 5, 3), dtype=np.uint8)
    blob = bytearray(encode_bmp(px[::-1]))  # encoder stores bottom-up
    struct.pack_into("<i", blob, 14 + 8, -4)  # flip to top-down
    assert (decode_bmp(bytes(blob)) == px[::-1][::-1]).all()
    for bad in (b"", b"XX" + bytes(60), encode_bmp(px)[:20]):
        with _pytest.raises(ValueError):
            decode_bmp(bad)
    # 8-bpp / compressed headers refused
    blob = bytearray(encode_bmp(px))
    struct.pack_into("<H", blob, 14 + 14, 8)
    with _pytest.raises(ValueError):
        decode_bmp(bytes(blob))


def test_bmp_stats_spark_side(spark):
    """bmp_image_stats decodes real blobs in mapInPandas and the plan
    projects only (media_id, content) — metadata never rides along."""
    from java_iceberg_table_spark.operators.multimodal import (
        bmp_image_stats,
        synthetic_bmp_media,
    )

    media = synthetic_bmp_media(spark, n=12)
    stats = bmp_image_stats(media)
    rows = stats.collect()
    assert len(rows) == 12
    meta = {r["media_id"]: (r["width"], r["height"]) for r in media.collect()}
    for r in rows:
        assert (r["dec_width"], r["dec_height"]) == meta[r["media_id"]]
        assert 0.0 <= r["mean_r"] <= 255.0


def test_ivfpq_table_probe_prunes_files(spark, sf_dir, tmp_path):
    """Table-backed IVF-PQ (round 8): the persisted index is an engine
    table partitioned by cluster; a probe's runtime-filtered plan
    touches only the probed cells' files, and results equal the
    in-memory ivfpq_topk over the same index."""
    from java_iceberg_table_spark.operators.similarity import (
        ivfpq_table_topk,
        ivfpq_topk,
        ivfpq_write_table,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    tbl, cents, books = ivfpq_write_table(
        str(tmp_path / "idx"), emb,
        n_centroids=8, m=16, n_codes=32, kmeans_iters=2, pq_iters=1,
    )
    q = emb.filter(F.col("vec_id") < 3)
    got, info = ivfpq_table_topk(
        spark, tbl, cents, books, q, k=5, nprobe=2, rerank=20
    )
    got = got.collect()
    assert info["files_scanned"] < info["files_total"]
    assert info["files_scanned"] > 0
    # parity with the in-memory probe at the same parameters
    mem = ivfpq_topk(
        tbl.scan(spark).select(
            F.col("id"), F.col("vec"), F.col("cluster"), F.col("code")
        ),
        cents, books, q, k=5, nprobe=2, rerank=20,
    ).collect()
    assert {(r["query_id"], r["neighbor_id"]) for r in got} == {
        (r["query_id"], r["neighbor_id"]) for r in mem
    }


def test_split_hash_overflow_safe_engine_parity(spark):
    """The split hash must agree between Spark and DuckDB for ids past
    the old wrap point (~3.5e9, where raw id*2654435761 leaves int64:
    Spark wrapped to negative remainders while DuckDB promoted), and
    must never emit a negative bucket."""
    import duckdb

    from java_iceberg_table_spark.queries.llm_ops import (
        HASH_RED,
        safe_mult_hash,
        safe_mult_hash_sql,
    )

    ids = [
        0, 1, 7, HASH_RED - 1, HASH_RED, HASH_RED + 13,
        3_500_000_000, 2**32, 2**40 + 3, 4 * 10**18,
        2**63 - 1, -5, -(2**40),
    ]
    sdf = spark.createDataFrame([(i,) for i in ids], "id long").select(
        "id", F.pmod(safe_mult_hash("id"), F.lit(100)).alias("bucket")
    )
    got = {r["id"]: r["bucket"] for r in sdf.collect()}
    con = duckdb.connect()
    expr = f"{safe_mult_hash_sql('id')} % 100"
    want = dict(
        con.execute(
            f"SELECT id, {expr} FROM (SELECT UNNEST(?::BIGINT[]) AS id)",
            [ids],
        ).fetchall()
    )
    assert got == want
    assert all(0 <= b < 100 for b in got.values())
    # identity below the reduction modulus: small-id assignments are
    # exactly what the unreduced hash gave (fixture-scale unchanged)
    for i in (0, 1, 7, HASH_RED - 1):
        assert got[i] == (i * 2654435761) % 100


def test_leakage_safe_split_near_dup_variant(spark, sf_dir):
    """The near-dup generalization of h55: split on the connected
    COMPONENT id of the minhash graph instead of the exact-dup
    canonical. No component may span splits, every doc gets exactly
    one split, and docs outside any component split independently."""
    from java_iceberg_table_spark.operators.dedup import (
        minhash_rep_graph,
        resolve_components,
    )

    docs = load_table(spark, sf_dir, "documents")
    rep_pairs, membership = minhash_rep_graph(
        docs, "doc_id", "text", threshold=0.8
    )
    comp = resolve_components(rep_pairs, membership)  # (id, comp)
    labeled = docs.select("doc_id").join(
        comp.withColumnRenamed("id", "doc_id"), "doc_id", "left"
    ).select(
        "doc_id",
        F.coalesce("comp", "doc_id").alias("group_id"),
    )
    from java_iceberg_table_spark.queries.llm_ops import safe_mult_hash

    r = F.pmod(safe_mult_hash("group_id"), F.lit(100))
    s = labeled.select(
        "doc_id",
        "group_id",
        F.when(r < 80, "train").when(r < 90, "val").otherwise("test").alias("split"),
    )
    n_docs = docs.count()
    assert s.count() == n_docs
    assert s.select("doc_id").distinct().count() == n_docs
    leaked = (
        s.groupBy("group_id")
        .agg(F.countDistinct("split").alias("ns"))
        .filter(F.col("ns") > 1)
        .count()
    )
    assert leaked == 0
    splits = {r["split"] for r in s.select("split").distinct().collect()}
    assert splits <= {"train", "val", "test"} and "train" in splits


def test_time_bucket_gapfill_semantics(spark):
    """Gap-fill contract on a hand-built series: dense spine, LOCF
    carries the last observation, interpolation is exact linear math,
    edges fall back to the one existing side."""
    from datetime import datetime

    from java_iceberg_table_spark.operators.timeseries import (
        time_bucket_gapfill,
    )

    rows = [
        # series "a": days 1, 4 observed -> gaps on 2, 3
        ("a", datetime(2024, 1, 1, 5), 10.0),
        ("a", datetime(2024, 1, 4, 7), 40.0),
        # series "b": only day 2 observed -> edges fill from it
        ("b", datetime(2024, 1, 2, 9), 7.0),
    ]
    df = spark.createDataFrame(rows, "s string, ts timestamp, v double")
    out = {
        (r["series"], str(r["bucket_ts"])): r
        for r in time_bucket_gapfill(df, "s", "ts", "v").collect()
    }
    # spine is GLOBAL span (Jan 1-4) x both series = 8 rows
    assert len(out) == 8
    a2 = out[("a", "2024-01-02")]
    a3 = out[("a", "2024-01-03")]
    assert a2["n_events"] == 0 and a2["avg_value"] is None
    assert a2["locf_value"] == 10.0 and a3["locf_value"] == 10.0
    assert abs(a2["lin_value"] - 20.0) < 1e-9  # 10 + (40-10)*(1/3)
    assert abs(a3["lin_value"] - 30.0) < 1e-9
    b1 = out[("b", "2024-01-01")]
    b4 = out[("b", "2024-01-04")]
    assert b1["locf_value"] is None and b1["lin_value"] == 7.0  # next-edge
    assert b4["locf_value"] == 7.0 and b4["lin_value"] == 7.0  # prev-edge
    obs = out[("a", "2024-01-01")]
    assert obs["avg_value"] == obs["locf_value"] == obs["lin_value"] == 10.0


def test_topk_view_incremental_folds(spark, tmp_path):
    """Maintained top-k view: after EVERY fold the view equals a full
    top-k recompute over all source rows so far — including folds
    that displace previously-held rows, touch only some keys, add
    brand-new keys, or are empty. Commits are MOR equality delete +
    append (no data rewrite until the maintenance pass)."""
    from java_iceberg_table_spark.operators.topk_view import (
        topk_frame,
        topk_refresh,
    )
    from java_iceberg_table_spark.table import create_table

    schema = "k long, v long, ts long"
    batches = [
        # initial: key 1 has 4 rows (one already outside top-3)
        [(1, 10, 1), (1, 20, 2), (1, 30, 3), (1, 40, 4), (2, 5, 1)],
        # displaces key 1's rank-2/3 (earlier ts), leaves key 2 alone
        [(1, 99, 0)],
        # new key + key-2 growth past k
        [(3, 7, 1), (2, 6, 0), (2, 8, 2), (2, 9, 3)],
        [],  # empty fold is a no-op
        [(3, 1, 0), (1, 50, 5)],  # one displacing, one ignorable
    ]
    order_cols = ["ts", "v"]
    all_rows: list[tuple] = []
    root = str(tmp_path / "mv")
    init = spark.createDataFrame(batches[0], schema)
    all_rows += batches[0]
    mv = create_table(
        root, topk_frame(init, "k", order_cols, 3).schema
    )
    mv.append(topk_frame(init, "k", order_cols, 3))
    for batch in batches[1:]:
        delta = spark.createDataFrame(batch, schema) if batch else (
            spark.createDataFrame([], schema)
        )
        stats = topk_refresh(spark, mv, delta, "k", order_cols, 3)
        all_rows += batch
        if not batch:
            assert stats == {"touched_keys": 0, "view_rows_written": 0}
        expect = {
            tuple(r)
            for r in topk_frame(
                spark.createDataFrame(all_rows, schema), "k", order_cols, 3
            ).collect()
        }
        got = {tuple(r) for r in mv.scan(spark).collect()}
        assert got == expect, f"after fold {batch}"
    # maintenance pass: masks materialize, content identical
    mv.rewrite_deletes(spark)
    mv.compact_data_files(spark, sort_by=["k", "rn"])
    got = {tuple(r) for r in mv.scan(spark).collect()}
    assert got == expect
    snap = mv.metadata.current_snapshot()
    assert snap is not None and not snap.delete_manifests


def test_topk_fold_prunes_view_files(spark, tmp_path):
    """The fold's view read is runtime-filtered: on a key-sorted view
    (disjoint key ranges per file) a fold touching a narrow key range
    reads only the admitting files, never the whole view — the
    property that keeps fold cost delta-sized at 100 TB."""
    from java_iceberg_table_spark.operators.topk_view import (
        topk_frame,
        topk_refresh,
    )
    from java_iceberg_table_spark.table import create_table

    schema = "k long, v long, ts long"
    src = spark.createDataFrame(
        [(i % 400, i, i) for i in range(4000)], schema
    )
    init = topk_frame(src, "k", ["ts", "v"], 3)
    mv = create_table(
        str(tmp_path / "mv"), init.schema,
        properties={"write.sort.order": "k"},
    )
    mv.append(init.repartition(4))
    n_files = len(mv.plan_files())
    assert n_files >= 4  # sorted into disjoint k-ranges
    delta = spark.createDataFrame([(3, 9999, 0), (7, 9998, 0)], schema)
    stats = topk_refresh(spark, mv, delta, "k", ["ts", "v"], 3)
    assert stats["touched_keys"] == 2
    assert stats["view_files_total"] == n_files
    assert 1 <= stats["view_files_scanned"] < n_files
    # and the fold is still exact
    expect = {
        tuple(r)
        for r in topk_frame(
            src.unionByName(delta), "k", ["ts", "v"], 3
        ).collect()
    }
    assert {tuple(r) for r in mv.scan(spark).collect()} == expect


def test_additive_agg_view_folds(spark, tmp_path):
    """Maintained additive-aggregate view: each fold of a per-key
    delta (positive = inserts, negative = CDC deletes) leaves the
    view equal to a full recompute — touched keys merge, untouched
    keys persist, new keys appear."""
    from java_iceberg_table_spark.operators.agg_view import additive_refresh
    from java_iceberg_table_spark.table import create_table

    schema = "k string, cnt long, sv double"
    root = str(tmp_path / "mv")
    mv = create_table(root, spark.createDataFrame([], schema).schema)
    mv.append(spark.createDataFrame([("a", 3, 30.0), ("b", 1, 5.0)], schema))
    state = {"a": (3, 30.0), "b": (1, 5.0)}
    folds = [
        [("a", 2, 12.5)],                      # touched key merges
        [("c", 4, 1.0), ("b", -1, -5.0)],      # new key + delete-signed
        [],                                     # no-op
        [("c", -4, -1.0)],                      # count reaches 0 -> row leaves
    ]
    for fold in folds:
        delta = spark.createDataFrame(fold, schema) if fold else (
            spark.createDataFrame([], schema)
        )
        stats = additive_refresh(
            spark, mv, delta, ["k"], drop_when_zero="cnt"
        )
        for k, c, s in fold:
            oc, os_ = state.get(k, (0, 0.0))
            state[k] = (oc + c, os_ + s)
            if state[k][0] == 0:
                del state[k]
        if not fold:
            assert stats == {"touched_keys": 0, "view_rows_written": 0}
        got = {
            r["k"]: (r["cnt"], r["sv"]) for r in mv.scan(spark).collect()
        }
        assert got == state, f"after fold {fold}"
    mv.rewrite_deletes(spark)
    mv.compact_data_files(spark, sort_by=["k"])
    got = {r["k"]: (r["cnt"], r["sv"]) for r in mv.scan(spark).collect()}
    assert got == state


def test_counter_delta_reset_semantics(spark):
    """Counter deltas: first sample NULL, monotone increases subtract,
    a drop is a reset (delta = new value), rates divide by elapsed."""
    from datetime import datetime

    from java_iceberg_table_spark.operators.timeseries import counter_delta

    rows = [
        ("a", datetime(2024, 1, 1, 0, 0, 0), 100.0),
        ("a", datetime(2024, 1, 1, 0, 0, 10), 160.0),   # +60 over 10 s
        ("a", datetime(2024, 1, 1, 0, 0, 20), 5.0),     # reset -> 5
        ("a", datetime(2024, 1, 1, 0, 0, 30), 25.0),    # +20
        ("b", datetime(2024, 1, 1, 0, 0, 0), 7.0),
    ]
    df = spark.createDataFrame(rows, "s string, ts timestamp, c double")
    got = {
        (r["series"], str(r["ts"])): r
        for r in counter_delta(df, "s", "ts", "c").collect()
    }
    a0 = got[("a", "2024-01-01 00:00:00")]
    assert a0["delta"] is None and a0["rate_per_sec"] is None
    a1 = got[("a", "2024-01-01 00:00:10")]
    assert a1["delta"] == 60.0 and abs(a1["rate_per_sec"] - 6.0) < 1e-9
    a2 = got[("a", "2024-01-01 00:00:20")]
    assert a2["was_reset"] and a2["delta"] == 5.0
    a3 = got[("a", "2024-01-01 00:00:30")]
    assert not a3["was_reset"] and a3["delta"] == 20.0
    b0 = got[("b", "2024-01-01 00:00:00")]
    assert b0["delta"] is None and not b0["was_reset"]


def test_ivfpq_residual_encoding(spark, sf_dir):
    """Residual IVF-PQ (IVFADC, Jégou 2011 §IV): codebooks trained on
    cell residuals, per-cell query distance tables. Contract: recall
    holds the family bar and reported sims stay exact cosines. On this
    NEAR-ISOTROPIC fixture residuals measure ~equal to flat codes
    (cells capture little structure, so residuals ~ vectors — measured
    0.90-0.92 vs flat 0.92); the residual win appears on clustered
    corpora, where cell variance >> residual variance."""
    import numpy as np

    from java_iceberg_table_spark.operators.similarity import (
        ivfpq_build,
        ivfpq_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = brute_force_topk(emb, queries, k=5).collect()
    exact_by_q: dict = {}
    for r in exact:
        exact_by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    def recall_of(residual):
        index_df, cents, books = ivfpq_build(
            emb, n_centroids=8, m=16, n_codes=32,
            kmeans_iters=2, pq_iters=2, residual=residual,
        )
        index_df = index_df.persist()
        try:
            approx = ivfpq_topk(
                index_df, cents, books, queries,
                k=5, nprobe=6, rerank=20, residual=residual,
            ).collect()
        finally:
            index_df.unpersist()
        got: dict = {}
        for r in approx:
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        recs = [
            len(exact_by_q[q] & got.get(q, set())) / len(exact_by_q[q])
            for q in exact_by_q
        ]
        return sum(recs) / len(recs), approx

    rec_res, approx_res = recall_of(residual=True)
    assert rec_res >= 0.9, f"residual IVF-PQ recall too low: {rec_res}"
    # reported sims stay exact cosines (re-rank unchanged)
    exact_sims = {(r["query_id"], r["neighbor_id"]): r["sim"] for r in exact}
    for r in approx_res:
        key = (r["query_id"], r["neighbor_id"])
        if key in exact_sims:
            assert abs(r["sim"] - exact_sims[key]) < 1e-9


def test_m4_downsample_semantics(spark):
    """M4 contract on a hand-built series: per bucket exactly one row
    carrying first/last by time and min/max by value; buckets with one
    point collapse all four roles onto it."""
    from datetime import datetime

    from java_iceberg_table_spark.operators.timeseries import m4_downsample

    rows = [
        ("a", datetime(2024, 1, 1, 1), 5.0),
        ("a", datetime(2024, 1, 1, 9), 1.0),   # min
        ("a", datetime(2024, 1, 1, 15), 9.0),  # max
        ("a", datetime(2024, 1, 1, 23), 4.0),  # last
        ("a", datetime(2024, 1, 2, 8), 7.0),   # singleton bucket
        ("b", datetime(2024, 1, 1, 3), 2.0),
    ]
    df = spark.createDataFrame(rows, "s string, ts timestamp, v double")
    got = {
        (r["series"], str(r["bucket_ts"])): r
        for r in m4_downsample(df, "s", "ts", "v").collect()
    }
    assert len(got) == 3
    a1 = got[("a", "2024-01-01 00:00:00")]
    assert a1["n_points"] == 4
    assert a1["first_v"] == 5.0 and a1["last_v"] == 4.0
    assert a1["min_v"] == 1.0 and a1["max_v"] == 9.0
    assert str(a1["first_ts"]) == "2024-01-01 01:00:00"
    assert str(a1["last_ts"]) == "2024-01-01 23:00:00"
    a2 = got[("a", "2024-01-02 00:00:00")]
    assert (
        a2["n_points"] == 1
        and a2["first_v"] == a2["last_v"] == a2["min_v"] == a2["max_v"] == 7.0
    )
    b1 = got[("b", "2024-01-01 00:00:00")]
    assert b1["n_points"] == 1 and b1["min_v"] == 2.0


def test_m4_downsample_month_bucket(spark):
    """The bucket parameter generalizes: month buckets roll whole
    months into one M4 row (non-uniform bucket widths are fine here —
    unlike gap-fill interpolation, M4 needs no uniform step)."""
    from datetime import datetime

    from java_iceberg_table_spark.operators.timeseries import m4_downsample

    rows = [
        ("a", datetime(2024, 1, 5), 3.0),
        ("a", datetime(2024, 1, 25), 8.0),
        ("a", datetime(2024, 2, 2), 1.0),
    ]
    df = spark.createDataFrame(rows, "s string, ts timestamp, v double")
    got = {
        str(r["bucket_ts"]): r
        for r in m4_downsample(df, "s", "ts", "v", bucket="month").collect()
    }
    assert set(got) == {"2024-01-01 00:00:00", "2024-02-01 00:00:00"}
    jan = got["2024-01-01 00:00:00"]
    assert jan["n_points"] == 2 and jan["first_v"] == 3.0
    assert jan["last_v"] == 8.0 and jan["max_v"] == 8.0


def test_ivfpq_residual_beats_flat_on_clustered(spark):
    """The round-8 caveat, closed with a measurement: on a CLUSTERED
    corpus (where cell variance >> residual variance) residual
    codebooks (IVFADC) beat flat PQ codes at identical parameters.
    Measured: residual 0.850 vs flat 0.733 recall@5; asserted with
    headroom (>= +0.05 margin, residual >= 0.8) so float-reduction
    jitter across session widths can't flip the verdict."""
    from java_iceberg_table_spark.operators.similarity import (
        brute_force_topk,
        clustered_corpus,
        ivfpq_build,
        ivfpq_topk,
    )

    emb = clustered_corpus(spark, n=4000).persist()
    emb.count()
    queries = emb.filter(F.col("vec_id") < 12)
    exact = brute_force_topk(emb, queries, k=5).collect()
    exact_by_q: dict = {}
    for r in exact:
        exact_by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])

    def recall_of(residual: bool) -> float:
        index_df, cents, books = ivfpq_build(
            emb, n_centroids=16, m=16, n_codes=16,
            kmeans_iters=3, pq_iters=3, residual=residual,
        )
        index_df = index_df.persist()
        try:
            approx = ivfpq_topk(
                index_df, cents, books, queries,
                k=5, nprobe=4, rerank=4, residual=residual,
            ).collect()
        finally:
            index_df.unpersist()
        got: dict = {}
        for r in approx:
            got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        recs = [
            len(exact_by_q[q] & got.get(q, set())) / len(exact_by_q[q])
            for q in exact_by_q
        ]
        return sum(recs) / len(recs)

    rec_flat = recall_of(False)
    rec_res = recall_of(True)
    emb.unpersist()
    assert rec_res >= 0.8, rec_res
    assert rec_res >= rec_flat + 0.05, (rec_res, rec_flat)


def test_time_bucket_gapfill_hourly(spark):
    """Hour buckets: same fill semantics with timestamp buckets and
    3600-second interpolation steps."""
    from datetime import datetime

    from java_iceberg_table_spark.operators.timeseries import (
        time_bucket_gapfill,
    )

    rows = [
        ("a", datetime(2024, 1, 1, 0, 10), 10.0),
        ("a", datetime(2024, 1, 1, 3, 50), 40.0),  # gaps at 01:00, 02:00
    ]
    df = spark.createDataFrame(rows, "s string, ts timestamp, v double")
    out = {
        str(r["bucket_ts"]): r
        for r in time_bucket_gapfill(df, "s", "ts", "v", bucket="hour").collect()
    }
    assert len(out) == 4
    assert abs(out["2024-01-01 01:00:00"]["lin_value"] - 20.0) < 1e-9
    assert abs(out["2024-01-01 02:00:00"]["lin_value"] - 30.0) < 1e-9
    assert out["2024-01-01 02:00:00"]["locf_value"] == 10.0
    import pytest as _pytest
    with _pytest.raises(ValueError):
        time_bucket_gapfill(df, "s", "ts", "v", bucket="month")


def test_lttb_downsample_hand_series(spark):
    """LTTB on a hand-computed series (n_out=5, 7 points, buckets
    {1,2},{3,4},{5}): step 1 picks (1,10) (area 61 vs 11 against
    bucket-2's centroid), step 2 picks (4,8) (19 vs 18 against the
    bucket-3 point), step 3 keeps (5,1); first/last always kept."""
    from java_iceberg_table_spark.operators.timeseries import lttb_downsample

    pts = [(0, 0.0), (1, 10.0), (2, 1.0), (3, 1.0), (4, 8.0), (5, 1.0), (6, 0.0)]
    df = spark.createDataFrame(
        [("a", i * 1_000_000, v) for i, v in pts], "s string, us long, v double"
    ).select("s", F.timestamp_micros(F.col("us")).alias("ts"), "v")
    out = sorted(
        (r["ts_us"] // 1_000_000, r["value"])
        for r in lttb_downsample(df, "s", "ts", "v", n_out=5).collect()
    )
    assert out == [(0, 0.0), (1, 10.0), (4, 8.0), (5, 1.0), (6, 0.0)]
    # a series at-or-under n_out passes through whole
    small = lttb_downsample(df, "s", "ts", "v", n_out=7).collect()
    assert len(small) == 7
    # per-series independence: two series downsample separately
    df2 = df.unionByName(df.withColumn("s", F.lit("b")))
    both = lttb_downsample(df2, "s", "ts", "v", n_out=5).collect()
    assert len(both) == 10


def test_lttb_large_epoch_series_exact(spark):
    """Round-10 review regression: bucket sums over absolute epoch
    microseconds (~1.75e15) silently wrapped numpy's int64 accumulator
    once a bucket exceeded ~5,270 points, corrupting the selection
    with no error. The operator now sums series-relative coordinates
    (translation-invariant area terms); this replays a 12k-point
    series at a realistic epoch against a pure-Python exact-integer
    reference."""
    import numpy as np

    from java_iceberg_table_spark.operators.timeseries import lttb_downsample

    rng = np.random.RandomState(7)
    n, n_out = 12_000, 4  # nb=2 -> ~6k-point buckets (old code wrapped)
    base_us = 1_750_000_000_000_000
    raw = rng.randint(0, 30 * 86400 * 10**6, size=3 * n).astype(np.int64)
    xs = np.sort(base_us + np.unique(raw)[:n])
    assert len(xs) == n
    vs = np.round(rng.uniform(0, 500, size=n), 2)
    df = spark.createDataFrame(
        [("s", int(x), float(v)) for x, v in zip(xs, vs)],
        "s string, us long, v double",
    ).select("s", F.timestamp_micros(F.col("us")).alias("ts"), "v")
    got = sorted(
        (r["ts_us"], round(r["value"], 6))
        for r in lttb_downsample(df, "s", "ts", "v", n_out=n_out).collect()
    )

    # exact-integer reference (Python ints never wrap)
    vq = [int(round(v * 1e6)) for v in vs]
    x = [int(t) for t in xs]
    nb, mid = n_out - 2, n - 2
    buckets = [[] for _ in range(nb)]
    for i in range(1, n - 1):
        buckets[((i - 1) * nb) // mid].append(i)
    sel, prev = [0], 0
    for k in range(nb):
        if k < nb - 1:
            nxt = buckets[k + 1]
            na, sx, sv = len(nxt), sum(x[j] for j in nxt), sum(vq[j] for j in nxt)
        else:
            na, sx, sv = 1, x[-1], vq[-1]
        xp, vp = x[prev], vq[prev]
        best = None
        for j in buckets[k]:
            a = abs(
                float(na * xp - sx) * float(vq[j] - vp)
                - float(xp - x[j]) * float(sv - na * vp)
            )
            key = (-a, x[j], vq[j])
            if best is None or key < best[0]:
                best = (key, j)
        sel.append(best[1])
        prev = best[1]
    sel.append(n - 1)
    want = sorted((x[j], round(vq[j] / 1e6, 6)) for j in sel)
    assert got == want


def test_lttb_overflow_guard_raises(spark):
    """A series whose span x bucket size would overflow int64 even in
    relative coordinates refuses loudly instead of wrapping."""
    from java_iceberg_table_spark.operators.timeseries import lttb_downsample

    span = 2**57  # ~4500 years in us; 60-point buckets push past 2^62
    pts = [("s", int(i * span / 200), float(i % 7)) for i in range(200)]
    df = spark.createDataFrame(
        pts, "s string, us long, v double"
    ).select("s", F.timestamp_micros(F.col("us")).alias("ts"), "v")
    import pytest as _pytest

    with _pytest.raises(Exception, match="overflow int64"):
        lttb_downsample(df, "s", "ts", "v", n_out=5).collect()


def test_lttb_matches_reference_over_random_series(spark):
    """Property check: 30 seeded random series (varying length, n_out,
    duplicate-timestamp collisions) in ONE DataFrame all downsample to
    exactly the pure-Python exact-integer reference selection."""
    import numpy as np

    from java_iceberg_table_spark.operators.timeseries import lttb_downsample

    def reference(xs, vqs, n_out):
        n = len(xs)
        pts = sorted(zip(xs, vqs))
        x = [p[0] for p in pts]
        vq = [p[1] for p in pts]
        if n <= n_out:
            return sorted((a, b) for a, b in pts)
        nb, mid = n_out - 2, n - 2
        buckets = [[] for _ in range(nb)]
        for i in range(1, n - 1):
            buckets[((i - 1) * nb) // mid].append(i)
        sel, prev = [0], 0
        for k in range(nb):
            if k < nb - 1:
                nxt = buckets[k + 1]
                na = len(nxt)
                sx = sum(x[j] for j in nxt)
                sv = sum(vq[j] for j in nxt)
            else:
                na, sx, sv = 1, x[-1], vq[-1]
            xp, vp = x[prev], vq[prev]
            best = None
            for j in buckets[k]:
                a = abs(
                    float(na * xp - sx) * float(vq[j] - vp)
                    - float(xp - x[j]) * float(sv - na * vp)
                )
                key = (-a, x[j], vq[j])
                if best is None or key < best[0]:
                    best = (key, j)
            sel.append(best[1])
            prev = best[1]
        sel.append(n - 1)
        return sorted((x[j], vq[j]) for j in sel)

    rng = np.random.RandomState(42)
    n_out = 8
    rows, want = [], {}
    for s in range(30):
        n = int(rng.randint(3, 200))
        base = int(rng.randint(0, 10**15))
        # coarse grid forces duplicate timestamps in some series
        xs = [base + int(rng.randint(0, max(n // 2, 2)) * 1_000_000)
              for _ in range(n)]
        vqs = [int(rng.randint(-5, 6)) * 500_000 for _ in range(n)]
        name = f"s{s}"
        rows += [(name, x, vq / 1e6) for x, vq in zip(xs, vqs)]
        want[name] = reference(xs, vqs, n_out)
    df = spark.createDataFrame(
        rows, "s string, us long, v double"
    ).select("s", F.timestamp_micros(F.col("us")).alias("ts"), "v")
    got = {}
    for r in lttb_downsample(df, "s", "ts", "v", n_out=n_out).collect():
        got.setdefault(r["series"], []).append(
            (r["ts_us"], int(round(r["value"] * 1e6)))
        )
    for name in want:
        assert sorted(got[name]) == want[name], name


def test_ivfpq_table_append_incremental(spark, sf_dir, tmp_path):
    """Incremental IVF-PQ index maintenance (round 10): new vectors
    fold into the persisted index table with the model FROZEN —
    encode-only append sized by the delta, appended (cluster, code)
    rows byte-equal a from-scratch encode under the same model, files
    stay single-cell so probe pruning survives the append, and probes
    over the grown index find the new vectors."""
    from java_iceberg_table_spark.operators.similarity import (
        annotate_recall,
        brute_force_topk,
        ivfpq_encode,
        ivfpq_table_append,
        ivfpq_table_topk,
        ivfpq_write_table,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    base = emb.filter(F.col("vec_id") % 4 != 0)
    delta = emb.filter(F.col("vec_id") % 4 == 0)
    tbl, cents, books = ivfpq_write_table(
        str(tmp_path / "idx"), base,
        n_centroids=8, m=16, n_codes=16, kmeans_iters=2, pq_iters=1,
    )
    rows_before = tbl.scan(spark).count()
    stats = ivfpq_table_append(tbl, delta, cents, books)
    assert stats["rows_appended"] == delta.count()
    assert 0 < stats["cells_touched"] <= 8
    after = tbl.scan(spark)
    assert after.count() == rows_before + stats["rows_appended"]
    # appended rows equal a from-scratch encode with the same frozen
    # model — maintenance is pure encode, no drift
    enc = ivfpq_encode(delta, cents, books).select("id", "cluster", "code")
    appended = after.join(
        delta.select(F.col("vec_id").alias("id")), "id"
    ).select("id", "cluster", "code")
    assert appended.exceptAll(enc).isEmpty()
    assert enc.exceptAll(appended).isEmpty()
    # probe pruning survives: single-query probe plans a strict subset
    # of the index files
    one = delta.orderBy("vec_id").limit(1)
    got, info = ivfpq_table_topk(
        spark, tbl, cents, books, one, k=5, nprobe=2, rerank=20
    )
    got.collect()
    assert 0 < info["files_scanned"] < info["files_total"]
    # the grown index answers for NEW vectors: recall vs brute force
    # over the FULL corpus (model trained on 75% of it)
    q = delta.filter(F.col("vec_id") < 40)
    exact = brute_force_topk(emb, q, k=5)
    approx, _ = ivfpq_table_topk(
        spark, tbl, cents, books, q, k=5, nprobe=6, rerank=20
    )
    ann = annotate_recall(approx, exact, k=5)
    ok = ann.agg(F.avg(F.col("recall_ok").cast("double"))).collect()[0][0]
    assert ok is not None and ok >= 0.8


def test_ivfpq_encode_refuses_dimension_mismatch(spark, sf_dir, tmp_path):
    """Frozen-model encode must fail LOUDLY on a dimension mismatch
    (wrong embedding column / model version) instead of silently
    emitting garbage cells and codes."""
    from java_iceberg_table_spark.operators.similarity import (
        ivfpq_encode,
        ivfpq_write_table,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    _tbl, cents, books = ivfpq_write_table(
        str(tmp_path / "idx"), emb.filter(F.col("vec_id") < 100),
        n_centroids=4, m=16, n_codes=8, kmeans_iters=1, pq_iters=1,
    )
    wrong = emb.select(
        "vec_id", F.slice("embedding", 1, 32).alias("embedding")
    )
    with pytest.raises(ValueError, match="dim"):
        ivfpq_encode(wrong, cents, books)


def test_lru_cache_bounds_and_recency():
    from java_iceberg_table_spark.operators.similarity import _LRUCache

    c = _LRUCache(maxsize=3)
    for i in range(3):
        c.put(i, f"v{i}")
    assert c.get(0) == "v0"  # refresh 0's recency
    c.put(3, "v3")  # evicts 1 (least recent), not 0
    assert set(c) == {0, 2, 3} and len(c) == 3
    assert c.get(1) is None


def test_dlit_nonfinite_and_quoted_names(spark):
    """ADVICE r14: _dlit must propagate NaN/Inf instead of mis-parsing,
    and the dim fast path must handle column names needing quoting."""
    from java_iceberg_table_spark.operators.similarity import _dlit, dot_expr

    vals = spark.range(1).select(
        F.expr(_dlit(float("nan"))).alias("n"),
        F.expr(_dlit(float("inf"))).alias("p"),
        F.expr(_dlit(float("-inf"))).alias("m"),
        F.expr(_dlit(1.5)).alias("f"),
    ).first()
    assert vals["n"] != vals["n"] and vals["p"] == float("inf")
    assert vals["m"] == float("-inf") and vals["f"] == 1.5
    df = spark.createDataFrame(
        [([1.0, 2.0], [3.0, 4.0])], ["my vec", "other-vec"]
    )
    got = df.select(dot_expr("my vec", "other-vec", dim=2).alias("d")).first()["d"]
    assert got == 11.0


def test_minhash_spread_and_skew_gates_value_identical(spark, sf_dir, monkeypatch):
    """Round 15: forcing the corpus-size gate ON (spread + edge-list
    round-robin) must leave the expanded near-dup pairs identical; the
    default gate must leave a small corpus's frame un-repartitioned."""
    import java_iceberg_table_spark.operators.dedup as D

    docs = load_table(spark, sf_dir, "documents")
    base = (
        minhash_near_duplicates(docs, "doc_id", "text", threshold=0.95,
                                num_hashes=64, bands=16)
        .orderBy("id_a", "id_b").collect()
    )
    monkeypatch.setattr(D, "_SPREAD_MIN_BYTES", 0)
    forced = (
        minhash_near_duplicates(docs, "doc_id", "text", threshold=0.95,
                                num_hashes=64, bands=16)
        .orderBy("id_a", "id_b").collect()
    )
    assert forced == base
    # gate semantics on the helper itself
    monkeypatch.setattr(D, "_SPREAD_MIN_BYTES", 1 << 60)
    assert D._spread_small_input(docs) is docs
    assert not D._corpus_is_large(docs)
