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
