"""Hypothesis property tests for the pure-math cores: the truncate
transform (partitioning + retention alignment, SURVEY §5.2) and set
operations used by the dedup verifiers."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from java_iceberg_table_spark.table.transforms import TruncateTransform

widths = st.sampled_from([1, 2, 60, 300_000_000, 10**12])
values = st.integers(min_value=0, max_value=2**62)


@given(v=values, w=widths)
@settings(max_examples=200, deadline=None)
def test_truncate_properties(v: int, w: int):
    t = TruncateTransform("ts", w)
    b = t.apply_py(v)
    assert b % w == 0  # bucket starts are aligned
    assert 0 <= v - b < w  # v lies inside its bucket
    assert t.apply_py(b) == b  # idempotent
    lo, hi = t.bucket_range(b)
    assert lo <= v < hi


@given(v=values, w=widths, retention=st.integers(min_value=0, max_value=2**40))
@settings(max_examples=200, deadline=None)
def test_retention_cutoff_never_splits_partition(v: int, w: int, retention: int):
    """The bookkeeper's floored cutoff (FileBasedBookkeeper.java:184-186)
    must always be a partition boundary, so a '<cutoff' delete matches
    whole partitions exactly."""
    t = TruncateTransform("ts", w)
    cutoff = t.apply_py(max(0, v - retention))
    assert cutoff % w == 0
    # every value in a partition strictly below the cutoff partition is
    # deleted; no value at/after the cutoff partition can be
    b = t.apply_py(v)
    if b + w <= cutoff:
        assert v < cutoff
    if b >= cutoff:
        assert v >= cutoff


@given(
    a=st.frozensets(st.integers(0, 63), min_size=1, max_size=40),
    b=st.frozensets(st.integers(0, 63), min_size=1, max_size=40),
)
@settings(max_examples=200, deadline=None)
def test_bitset_jaccard_matches_set_jaccard(a: frozenset, b: frozenset):
    """The bitset formulation used in minhash_near_duplicates' verify
    step equals true set Jaccard."""
    ba = sum(1 << i for i in a)
    bb = sum(1 << i for i in b)
    inter = bin(ba & bb).count("1")
    union = bin(ba | bb).count("1")
    expected = len(a & b) / len(a | b)
    assert inter / union == expected


@given(
    toks=st.lists(st.integers(min_value=1, max_value=700), min_size=1, max_size=60),
    budget=st.sampled_from([64, 512, 1024]),
)
@settings(max_examples=200, deadline=None)
def test_greedy_packing_invariants(toks: list[int], budget: int):
    """Pure-python core of the h24 packer: bins are consecutive from 1,
    no bin exceeds the budget unless it holds a single oversized doc,
    totals are preserved, and order is respected (bin ids are
    non-decreasing in doc order)."""
    import pandas as pd

    from java_iceberg_table_spark.operators.packing import _greedy_assign

    pdf = pd.DataFrame(
        {"group_key": "g", "doc_id": range(len(toks)), "n_tokens": toks}
    )
    out = _greedy_assign(pdf, budget).sort_values("doc_id")
    bins = out["bin"].tolist()
    assert bins[0] == 1
    assert all(b2 - b1 in (0, 1) for b1, b2 in zip(bins, bins[1:]))  # consecutive
    per_bin = out.groupby("bin")["n_tokens"].agg(["sum", "count"])
    for _, row in per_bin.iterrows():
        assert row["sum"] <= budget or row["count"] == 1  # oversized doc alone
    assert out["n_tokens"].sum() == sum(toks)  # nothing lost


@given(
    v=st.integers(min_value=0, max_value=2**40),
    w1=st.integers(min_value=1, max_value=2**20),
    w2=st.integers(min_value=1, max_value=2**20),
    cutoff=st.integers(min_value=0, max_value=2**40),
)
@settings(max_examples=200, deadline=None)
def test_per_spec_bucket_ranges_sound_under_evolution(v, w1, w2, cutoff):
    """Partition-evolution soundness: whichever spec a value was
    written under, the value lies inside that spec's bucket range
    (pruning with the OWN spec can never skip a matching file), and a
    whole-bucket retention drop under the own width never drops a
    value >= cutoff."""
    for w in (w1, w2):
        t = TruncateTransform("c", w)
        b = t.apply_py(v)
        lo, hi = t.bucket_range(b)
        assert lo <= v < hi
        # retention rule: file dropped iff bucket + width <= cutoff
        dropped = b + w <= cutoff
        if dropped:
            assert v < cutoff  # soundness: only fully-covered rows go
