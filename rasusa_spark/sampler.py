"""Local (per-group) sampling kernel mirroring the reference's selection
semantics (``SubSampler::indices``, reference src/subsampler.rs:75-108, and
the mode arithmetic in src/reads.rs:426-553 / src/cli.rs:313-319).

These functions are pure numpy/python — the distributed operators in
``rasusa_spark.operators.downsample`` call them inside ``applyInPandas``
per ``(source, bucket)`` group (exact-parity path) or use the vectorized
jump-ahead / random-key formulations (scale path).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .rng import Pcg64, index_sample, shuffled_indices


class StrictModeError(ValueError):
    """Raised when a strict-mode validation fails (reads.rs:473-491, 543-549)."""


@dataclass(frozen=True)
class SelectionResult:
    """Keep-mask + count — the reference's ``(Vec<bool>, usize)``."""

    keep: np.ndarray  # bool, len == total_reads
    n_kept: int


def select_by_bases(lengths: np.ndarray, target_bases: int, seed: int) -> SelectionResult:
    """ByBases budget selection (subsampler.rs:79-93): Fisher–Yates-shuffle
    all indices with Pcg64(seed), walk the shuffled order accumulating
    lengths, keep while cumulative-kept < target — the row that crosses the
    budget IS kept (condition checked before adding, subsampler.rs:83-91)."""
    n = len(lengths)
    keep = np.zeros(n, dtype=bool)
    order = shuffled_indices(n, seed)
    total = 0
    n_kept = 0
    for idx in order:
        if total >= target_bases:
            break
        keep[idx] = True
        total += int(lengths[idx])
        n_kept += 1
    return SelectionResult(keep, n_kept)


def select_by_reads(total_reads: int, n_reads: int, seed: int) -> SelectionResult:
    """ByReads selection (subsampler.rs:94-104): keep exactly
    min(n_reads, total) rows via ``index::sample`` — O(k), and when
    k == total the RNG is NOT consulted (mask filled directly)."""
    keep = np.zeros(total_reads, dtype=bool)
    k = min(int(n_reads), total_reads)
    if k == total_reads:
        keep[:] = True
    else:
        keep[index_sample(Pcg64(seed), total_reads, k)] = True
    return SelectionResult(keep, k)


def select_one_pass(n: int, frac: float, seed: int) -> SelectionResult:
    """One-pass Bernoulli (fastx.rs:127-160): i-th row kept ⟺ i-th
    sequential ``random_bool(frac)`` draw true; order preserved."""
    rng = Pcg64(seed)
    keep = np.fromiter((rng.random_bool(frac) for _ in range(n)), dtype=bool, count=n)
    return SelectionResult(keep, int(keep.sum()))


# --- mode arithmetic ---------------------------------------------------------


def target_bases_from_coverage(genome_size: int, coverage: float) -> int:
    """``GenomeSize * Coverage`` (cli.rs:313-319): f32 multiply, truncate.
    The f32 rounding is part of the contract (cli.rs test expects 49_503)."""
    return int(np.float32(genome_size) * np.float32(coverage))


def num_from_frac(frac: float, total_reads: int, strict: bool = False) -> int:
    """frac→k (reads.rs:516-541): round-half-away-from-zero of
    f64(frac_f32) × n; 0 warns (or errors under strict)."""
    x = float(np.float32(frac)) * float(total_reads)
    n = int(np.floor(x + 0.5))  # Rust f64::round = half away from zero (x ≥ 0)
    if n == 0 and strict:
        raise StrictModeError(
            f"Requested fraction of reads ({frac} * {total_reads}) was rounded to 0"
        )
    return n


def normalize_fraction(f: float) -> float:
    """``parse_fraction`` (cli.rs:473-482): (1, 100] ⟹ ÷100; [0, 1] kept;
    else error. Returned as the f32 the reference parses into."""
    if 1.0 < f <= 100.0:
        f = f / 100.0
    if not (0.0 <= f <= 1.0):
        raise ValueError(f"fraction must be in [0, 1] or (1, 100]: {f}")
    return float(np.float32(f))


_METRIC_SUFFIXES = {
    "b": 1,
    "kb": 10**3,
    "mb": 10**6,
    "gb": 10**9,
    "tb": 10**12,
}


def parse_metric_size(s: str) -> int:
    """``5.5mb`` → 5_500_000 (cli.rs:145-201): case-insensitive b/k/m/g/t
    (with optional trailing 'b'), float value × suffix, truncated to u64."""
    s = s.strip().lower()
    i = len(s)
    while i > 0 and not (s[i - 1].isdigit() or s[i - 1] == "."):
        i -= 1
    value, suffix = s[:i], s[i:]
    if not value:
        raise ValueError(f"invalid metric size: {s!r}")
    suffix = suffix or "b"
    if suffix in ("k", "m", "g", "t"):
        suffix += "b"
    if suffix not in _METRIC_SUFFIXES:
        raise ValueError(f"invalid metric suffix: {s!r}")
    return int(float(value) * _METRIC_SUFFIXES[suffix])


def parse_coverage(s: str) -> float:
    """``100x`` → 100.0 (cli.rs:365-398), as f32."""
    s = s.strip().lower()
    if s.endswith("x"):
        s = s[:-1]
    return float(np.float32(float(s)))


def check_strict_coverage(
    total_input_bases: int, genome_size: int, requested_coverage: float
) -> None:
    """Strict check (reads.rs:473-483): actual f64 depth, compared as f32."""
    depth = total_input_bases / float(genome_size)
    if np.float32(depth) < np.float32(requested_coverage):
        raise StrictModeError(
            f"Requested coverage ({requested_coverage:.2f}x) is not possible "
            f"as the actual coverage is {depth:.2f}x"
        )


def check_strict_bases(requested: int, total_input_bases: int) -> None:
    if requested > total_input_bases:
        raise StrictModeError(
            f"Requested number of bases ({requested}) is more than the input "
            f"({total_input_bases})"
        )


def check_strict_num(requested: int, total_reads: int) -> None:
    if requested > total_reads:
        raise StrictModeError(
            f"Requested number of reads ({requested}) is more than the input "
            f"({total_reads})"
        )


def check_paired_counts(first: int, second: int) -> None:
    """reads.rs:658-671: both inputs must contain equal record counts."""
    if first != second:
        raise ValueError(
            f"Paired input files have different read counts: {first} != {second}"
        )
