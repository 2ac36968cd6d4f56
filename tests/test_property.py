"""Hypothesis property tests — codec round-trips over arbitrary inputs and
sampler budget invariants (reference §5.4 statistical/property level)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from rasusa_spark.codecs.gorilla import dod_decode, dod_encode, xor_decode, xor_encode
from rasusa_spark.sampler import select_by_bases, select_by_reads

I64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)
F64 = st.floats(allow_nan=False, width=64)


@settings(max_examples=200, deadline=None)
@given(st.lists(I64, max_size=200))
def test_dod_roundtrip_any_int64(vals):
    arr = np.array(vals, dtype=np.int64)
    assert np.array_equal(dod_decode(dod_encode(arr)), arr)


@settings(max_examples=200, deadline=None)
@given(st.lists(F64, max_size=200))
def test_xor_roundtrip_any_float64(vals):
    arr = np.array(vals, dtype=np.float64)
    out = xor_decode(xor_encode(arr))
    assert np.array_equal(arr.view(np.uint64), out.view(np.uint64))


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=5_000), min_size=1, max_size=300),
    st.integers(min_value=1, max_value=10_000),
)
def test_greedy_pack_matches_rowwise_reference(lengths, capacity):
    """The searchsorted pack kernel must equal the row-stepping greedy
    definition (which is also the oracle's recursive-CTE semantics)."""
    from rasusa_spark.operators.pack import greedy_pack_ids

    got = list(greedy_pack_ids(np.array(lengths), capacity))
    ref, pid, fill = [], 0, None
    for ln in lengths:
        if fill is None:
            fill = ln
        elif fill + ln <= capacity:
            fill += ln
        else:
            pid += 1
            fill = ln
        ref.append(pid)
    assert got == ref
    # capacity invariant: a pack exceeds capacity only as a single oversize doc
    sums, counts = {}, {}
    for p, ln in zip(got, lengths):
        sums[p] = sums.get(p, 0) + ln
        counts[p] = counts.get(p, 0) + 1
    for p, s in sums.items():
        assert s <= capacity or counts[p] == 1


@settings(max_examples=100, deadline=None)
@given(
    st.lists(st.integers(min_value=1, max_value=10_000), min_size=1, max_size=300),
    st.integers(min_value=0, max_value=3_000_000),
    st.integers(min_value=0, max_value=2**32),
)
def test_budget_semantics_invariants(lengths, budget, seed):
    """subsampler.rs:75-93 invariants for any input: kept-sum crosses the
    budget by at most the last kept row; never keeps more than needed;
    keeps everything when the budget exceeds the total."""
    arr = np.array(lengths, dtype=np.int64)
    res = select_by_bases(arr, budget, seed)
    kept_sum = int(arr[res.keep].sum())
    total = int(arr.sum())
    if budget >= total:
        assert res.keep.all() and kept_sum == total
    elif budget == 0:
        assert res.n_kept == 0
    else:
        assert kept_sum >= budget  # crossing row kept
        assert kept_sum - int(arr[res.keep].max()) < budget  # nothing after it
    # determinism
    res2 = select_by_bases(arr, budget, seed)
    assert np.array_equal(res.keep, res2.keep)


@settings(max_examples=100, deadline=None)
@given(
    st.integers(min_value=0, max_value=500),
    st.integers(min_value=0, max_value=600),
    st.integers(min_value=0, max_value=2**32),
)
def test_by_reads_invariants(n, k, seed):
    res = select_by_reads(n, k, seed)
    assert res.n_kept == min(n, k)
    assert int(res.keep.sum()) == min(n, k)
