"""Sampler-semantics tests mirroring subsampler.rs / reads.rs / cli.rs units."""

from __future__ import annotations

import numpy as np
import pytest

from rasusa_spark.sampler import (
    StrictModeError,
    check_paired_counts,
    check_strict_coverage,
    num_from_frac,
    normalize_fraction,
    parse_coverage,
    parse_metric_size,
    select_by_bases,
    select_by_reads,
    select_one_pass,
    target_bases_from_coverage,
)


def test_by_bases_three_fifties_budget_100_seed_1():
    # subsampler.rs:285-298
    r = select_by_bases(np.array([50, 50, 50]), 100, seed=1)
    assert r.n_kept == 2
    assert list(r.keep) == [False, True, True]


def test_by_bases_all_huge_budget_100_seed_1():
    # subsampler.rs:329-343 — crossing row kept, then stop
    r = select_by_bases(np.array([500, 500, 500]), 100, seed=1)
    assert r.n_kept == 1
    assert list(r.keep) == [False, True, False]


def test_by_bases_sum_less_than_target_keeps_all():
    # subsampler.rs:301-312
    r = select_by_bases(np.array([5, 5, 5]), 100, seed=99)
    assert list(r.keep) == [True, True, True]


def test_by_bases_sum_equal_target_keeps_all():
    # subsampler.rs:314-326
    r = select_by_bases(np.array([25, 25, 50]), 100, seed=99)
    assert list(r.keep) == [True, True, True]


def test_by_bases_zero_budget_keeps_none():
    r = select_by_bases(np.array([], dtype=np.int64), 0, seed=1)
    assert r.n_kept == 0


def test_by_reads_k_geq_n_keeps_all_without_rng():
    # subsampler.rs:229-253
    r = select_by_reads(3, 10, seed=1)
    assert r.n_kept == 3 and r.keep.all()
    r = select_by_reads(3, 3, seed=1)
    assert r.n_kept == 3 and r.keep.all()


def test_by_reads_subset():
    r = select_by_reads(3, 2, seed=1)
    assert r.n_kept == 2 and r.keep.sum() == 2


def test_by_reads_seed_determinism():
    a = select_by_reads(1000, 100, seed=7)
    b = select_by_reads(1000, 100, seed=7)
    assert np.array_equal(a.keep, b.keep)


def test_one_pass_preserves_positions():
    r = select_one_pass(16, 0.5, seed=1)
    kept = [i + 1 for i in range(16) if r.keep[i]]
    assert kept == [2, 3, 6, 7, 8, 11, 14, 15, 16]  # reproducibility.rs:74-78


def test_coverage_f32_truncation():
    # cli.rs:846-855: 4200 * 11.7866 (f32 math) == 49_503 (f64 gives 49_503.72→49_503;
    # the f32 product is 49503.3… — truncation, not rounding, is the contract)
    assert target_bases_from_coverage(4_200, 11.7866) == 49_503
    # 4_411_532 * 50 = 220_576_600 exactly in integers, but the f32 product
    # rounds to 220_576_608 (> 2^24) — the f32 quirk IS the reference contract
    assert target_bases_from_coverage(4_411_532, 50.0) == 220_576_608


def test_num_from_frac_rounding():
    assert num_from_frac(0.5, 17) == 9  # 8.5 rounds away from zero
    assert num_from_frac(0.25, 1_000_000) == 250_000
    assert num_from_frac(0.0001, 100) == 0
    with pytest.raises(StrictModeError):
        num_from_frac(0.0001, 100, strict=True)


def test_normalize_fraction():
    assert normalize_fraction(50.0) == 0.5
    assert normalize_fraction(0.5) == 0.5
    assert normalize_fraction(1.0) == 1.0
    with pytest.raises(ValueError):
        normalize_fraction(101.0)
    with pytest.raises(ValueError):
        normalize_fraction(-0.1)


def test_parse_metric_size():
    assert parse_metric_size("5.5mb") == 5_500_000
    assert parse_metric_size("4.2MB") == 4_200_000
    assert parse_metric_size("1000") == 1000
    assert parse_metric_size("2gb") == 2_000_000_000
    assert parse_metric_size("1.5k") == 1500
    with pytest.raises(ValueError):
        parse_metric_size("5.5zb")


def test_parse_coverage():
    assert parse_coverage("100x") == 100.0
    assert parse_coverage("30") == 30.0


def test_strict_checks():
    with pytest.raises(StrictModeError):
        check_strict_coverage(100, 100, 5.0)  # actual 1x < 5x
    check_strict_coverage(1000, 100, 5.0)  # 10x ≥ 5x OK
    with pytest.raises(ValueError):
        check_paired_counts(5, 6)
