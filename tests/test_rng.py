"""Golden tests for the RNG kernel, encoding the reference's reproducibility
oracles (tests/reproducibility.rs:6-215, subsampler.rs unit tests)."""

from __future__ import annotations

import numpy as np
import pytest

from rasusa_spark.rng import (
    Pcg64,
    bernoulli_p_int,
    index_sample,
    pcg64_bernoulli_keys,
    pcg64_next_u64_at,
    shuffled_indices,
)

# tests/reproducibility.rs:71-129 — one-pass `-f 0.5`, seeds 1–5 on 16 reads.
# i-th read kept ⟺ i-th sequential random_bool(0.5) draw true (fastx.rs:127-160).
ONE_PASS_GOLDENS = {
    1: [2, 3, 6, 7, 8, 11, 14, 15, 16],
    2: [1, 2, 3, 5, 8, 10],
    3: [1, 2, 3, 9, 10, 12, 14, 16],
    4: [1, 2, 4, 13, 14, 16],
    5: [1, 3, 6, 7, 8, 11, 12, 13, 14, 16],
}

# tests/reproducibility.rs:6-68 — two-pass `-n 10`, seeds 1–5 on 16 reads:
# ByReads → index::sample(Pcg64(seed), 16, 10) (subsampler.rs:94-104).
TWO_PASS_N10_GOLDENS = {
    1: [1, 2, 3, 5, 7, 9, 11, 12, 14, 15],
    2: [1, 4, 7, 8, 9, 10, 11, 13, 14, 15],
    3: [2, 4, 5, 6, 8, 9, 10, 12, 13, 14],
    4: [1, 2, 3, 4, 5, 7, 10, 11, 13, 16],
    5: [4, 5, 6, 7, 8, 9, 10, 11, 14, 15],
}


@pytest.mark.parametrize("seed,expected", ONE_PASS_GOLDENS.items())
def test_one_pass_bernoulli_golden(seed, expected):
    rng = Pcg64(seed)
    kept = [i + 1 for i in range(16) if rng.random_bool(0.5)]
    assert kept == expected


@pytest.mark.parametrize("seed,expected", TWO_PASS_N10_GOLDENS.items())
def test_index_sample_golden(seed, expected):
    picked = sorted(index_sample(Pcg64(seed), 16, 10))
    assert [i + 1 for i in picked] == expected


def test_bernoulli_p_int_half_is_2_63():
    assert bernoulli_p_int(0.5) == 1 << 63
    assert bernoulli_p_int(1.0) == (1 << 64) - 1
    assert bernoulli_p_int(0.0) == 0


def test_shuffled_indices_seed1_n3():
    # subsampler.rs:285-298: lengths [50,50,50], budget 100, seed 1 → keep {1,2}
    # subsampler.rs:329-343: lengths [500,500,500], budget 100, seed 1 → keep {1}
    # ⟹ shuffled_indices(3, seed=1) begins [1, 2, ...]
    order = shuffled_indices(3, 1)
    assert sorted(order) == [0, 1, 2]
    assert order[0] == 1
    assert order[1] == 2


def test_shuffle_determinism_and_coverage():
    a = shuffled_indices(100, 7)
    b = shuffled_indices(100, 7)
    assert a == b
    assert sorted(a) == list(range(100))
    assert a != list(range(100))  # astronomically unlikely to be identity


def test_index_sample_regimes():
    # in-place regime (12 ≤ amount < 163, dense)
    r = index_sample(Pcg64(3), 30, 20)
    assert len(set(r)) == 20 and all(0 <= x < 30 for x in r)
    # rejection regime (sparse)
    r = index_sample(Pcg64(3), 1_000_000, 200)
    assert len(set(r)) == 200 and all(0 <= x < 1_000_000 for x in r)
    # amount ≥ 163 dense → in-place
    r = index_sample(Pcg64(3), 400, 200)
    assert len(set(r)) == 200


def test_jump_ahead_matches_sequential():
    seed = 42
    rng = Pcg64(seed)
    seq = np.array([rng.next_u64() for _ in range(200)], dtype=np.uint64)
    vec = pcg64_next_u64_at(seed, np.arange(200))
    assert np.array_equal(seq, vec)
    # non-contiguous indices
    idx = np.array([0, 5, 17, 199, 3, 64])
    assert np.array_equal(pcg64_next_u64_at(seed, idx), seq[idx])


@pytest.mark.parametrize("seed,expected", ONE_PASS_GOLDENS.items())
def test_vectorized_bernoulli_matches_golden(seed, expected):
    keep = pcg64_bernoulli_keys(seed, np.arange(16), 0.5)
    assert [i + 1 for i in range(16) if keep[i]] == expected


@pytest.mark.parametrize("p", [0.1, 0.25, 0.5, 0.9])
def test_one_pass_realized_fraction_accuracy(p):
    """Accuracy-sweep analog of the reference's benches/one_pass_accuracy.py
    (benches/README.md: worst miss 0.14pp at 1M reads, p=0.5): realized
    fraction at 100k draws within 0.5pp of the request."""
    n = 100_000
    keep = pcg64_bernoulli_keys(42, np.arange(n), p)
    realized = keep.sum() / n
    assert abs(realized - p) < 0.005
