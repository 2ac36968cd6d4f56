"""Exact Python port of the reference's randomness contract (SURVEY.md §2.9).

The reference (rasusa v5.1.0) derives every random decision from
``rand_pcg::Pcg64`` (PCG XSL-RR 128/64) seeded via rand_core's
``SeedableRng::seed_from_u64`` (reference: ``src/subsampler.rs:32-41``).
This module reproduces, bit-for-bit:

- ``Pcg64`` / ``seed_from_u64``            (rand_pcg 0.10.2 / rand_core 0.10.1)
- ``Bernoulli`` keep decisions              (``rng.random_bool(p)``, fastx.rs:146)
- single-sample uniform ints (Canon's method, rand 0.10 ``sample_single_inclusive``)
- distribution-form uniform ints (widening-multiply rejection, used by
  ``index::sample``'s rejection path)
- ``SliceRandom::shuffle`` (Durstenfeld + ``IncreasingUniform`` chunked draws,
  used by ByBases full shuffle, subsampler.rs:55-59)
- ``rand::seq::index::sample`` (Floyd / in-place / rejection selection,
  used by ByReads, subsampler.rs:94-104)

Ground truth: golden outputs in ``tests/reproducibility.rs`` and
``subsampler.rs`` unit tests — encoded in ``tests/test_rng.py``.

A vectorized numpy jump-ahead (``pcg64_bernoulli_keys``) exploits that the
PCG64 core is a 128-bit LCG: draw *i* is a closed-form function of
``(seed, i)``, making the one-pass sampler embarrassingly parallel.
"""

from __future__ import annotations

import numpy as np

MASK32 = 0xFFFFFFFF
MASK64 = 0xFFFFFFFFFFFFFFFF
MASK128 = (1 << 128) - 1

# PCG 128-bit default multiplier (rand_pcg::Lcg128Xsl64)
PCG_MUL = 0x2360ED051FC65DA44385DF649FCCF645

# rand_core::SeedableRng::seed_from_u64 internal PCG32 constants
_SFU_MUL = 6364136223846793005
_SFU_INC = 11634580027462260723


def seed_from_u64(seed: int) -> tuple[int, int]:
    """Expand a u64 seed into Pcg64 (state, increment) exactly as
    ``Pcg64::seed_from_u64(seed)`` does (rand_core default impl → 32-byte
    seed → ``Lcg128Xsl64::from_seed``).

    Returns the *raw* (state, increment) before ``from_state_incr``'s
    initial advance; callers must apply that advance (see ``Pcg64``).
    """
    state = seed & MASK64
    words = []
    for _ in range(8):  # 32 seed bytes, 4 at a time
        state = (state * _SFU_MUL + _SFU_INC) & MASK64
        xorshifted = (((state >> 18) ^ state) >> 27) & MASK32
        rot = state >> 59
        words.append(((xorshifted >> rot) | (xorshifted << ((32 - rot) & 31))) & MASK32)
    seed_u64 = [words[2 * i] | (words[2 * i + 1] << 32) for i in range(4)]
    state128 = seed_u64[0] | (seed_u64[1] << 64)
    incr = seed_u64[2] | (seed_u64[3] << 64)
    # from_seed: "The increment must be odd, hence we discard one bit"
    return state128, incr | 1


def _output_xsl_rr(state: int) -> int:
    """XSL-RR 128/64 output function."""
    rot = state >> 122
    xsl = ((state >> 64) ^ state) & MASK64
    if rot == 0:
        return xsl
    return ((xsl >> rot) | (xsl << (64 - rot))) & MASK64


class Pcg64:
    """Scalar Pcg64 (Lcg128Xsl64), bit-exact vs rand_pcg 0.10.2."""

    __slots__ = ("state", "incr")

    def __init__(self, seed: int):
        state, incr = seed_from_u64(seed)
        self.incr = incr
        # from_state_incr: move away from initial value, then one step
        self.state = ((state + incr) * PCG_MUL + incr) & MASK128

    def next_u64(self) -> int:
        self.state = (self.state * PCG_MUL + self.incr) & MASK128
        return _output_xsl_rr(self.state)

    def next_u32(self) -> int:
        # Lcg128Xsl64::next_u32 = next_u64 as u32 (low half; a full step)
        return self.next_u64() & MASK32

    # --- Bernoulli (rand::distr::Bernoulli) ------------------------------
    def random_bool(self, p: float) -> bool:
        return self.next_u64() < bernoulli_p_int(p)

    # --- Uniform ints ----------------------------------------------------
    def range_u32_inclusive(self, low: int, high: int) -> int:
        """``rng.random_range(low..=high)`` for u32 — Canon's method
        (rand 0.10 ``UniformInt::<u32>::sample_single_inclusive``)."""
        range_ = (high - low + 1) & MASK32
        if range_ == 0:  # full u32 range
            return self.next_u32()
        m = self.next_u32() * range_
        result, lo_order = m >> 32, m & MASK32
        if lo_order > ((-range_) & MASK32):
            new_hi = (self.next_u32() * range_) >> 32
            if lo_order + new_hi > MASK32:
                result += 1
        return (low + result) & MASK32

    def uniform_u32_sample(self, low: int, range_: int, thresh: int) -> int:
        """Distribution-form ``UniformInt::<u32>::sample`` (widening multiply,
        reject while low-order < thresh). Used by ``index::sample`` rejection."""
        if range_ == 0:
            return self.next_u32()
        while True:
            m = self.next_u32() * range_
            hi, lo = m >> 32, m & MASK32
            if lo >= thresh:
                return (low + hi) & MASK32


def bernoulli_p_int(p: float) -> int:
    """``Bernoulli::new(p)``: p_int = (p * 2^64) as u64 (truncating)."""
    if p >= 1.0:
        return MASK64  # ALWAYS_TRUE
    if p <= 0.0:
        return 0
    return min(int(p * 18446744073709551616.0), MASK64)


def uniform_u32_params(low: int, high_incl: int) -> tuple[int, int, int]:
    """(low, range, thresh) for the distribution-form u32 uniform."""
    range_ = (high_incl - low + 1) & MASK32
    thresh = ((-range_) & MASK32) % range_ if range_ > 0 else 0
    return low, range_, thresh


# --- IncreasingUniform + shuffle (rand 0.10 src/seq/increasing_uniform.rs) --


def _calculate_bound_u32(m: int) -> tuple[int, int]:
    """Largest product m*(m+1)*...*(m+count-1) fitting in u32, with count."""
    product = m
    current = m + 1
    while product * current <= MASK32:
        product *= current
        current += 1
    return product, current - m


class _IncreasingUniform:
    """Batched small-range index chooser used by ``SliceRandom::shuffle``:
    one uniform draw over m*(m+1)*...*(m+k-1) yields k successive indices
    via mixed-radix decomposition."""

    __slots__ = ("rng", "n", "chunk", "chunk_remaining")

    def __init__(self, rng: Pcg64, n: int):
        self.rng = rng
        self.n = n
        self.chunk = 0
        self.chunk_remaining = 0

    def next_index(self) -> int:
        next_n = self.n + 1
        if self.chunk_remaining == 0:
            bound, remaining = _calculate_bound_u32(next_n)
            self.chunk = self.rng.range_u32_inclusive(0, bound - 1)
            next_chunk_remaining = remaining - 1
        else:
            next_chunk_remaining = self.chunk_remaining - 1

        if next_chunk_remaining == 0:
            self.n = next_n
            result = self.chunk
        else:
            result = self.chunk % next_n
            self.chunk //= next_n
            self.n = next_n
        self.chunk_remaining = next_chunk_remaining
        return result


def shuffle_in_place(items: list, rng: Pcg64) -> None:
    """``SliceRandom::shuffle`` (rand 0.10): forward Durstenfeld with
    IncreasingUniform batched draws. Reference use: subsampler.rs:55-59."""
    n = len(items)
    if n <= 1:
        return
    chooser = _IncreasingUniform(rng, 0)
    for i in range(n):
        j = chooser.next_index()
        items[i], items[j] = items[j], items[i]


def shuffled_indices(n: int, seed: int) -> list[int]:
    """``SubSampler::shuffled_indices`` (subsampler.rs:55-59): 0..n shuffled
    with a fresh Pcg64(seed)."""
    idx = list(range(n))
    shuffle_in_place(idx, Pcg64(seed))
    return idx


# --- rand::seq::index::sample (rand 0.10 src/seq/index.rs) ------------------


def _sample_floyd(rng: Pcg64, length: int, amount: int) -> list[int]:
    indices: list[int] = []
    for j in range(length - amount, length):
        t = rng.range_u32_inclusive(0, j)
        for pos, x in enumerate(indices):
            if x == t:
                indices[pos] = j
                break
        indices.append(t)
    return indices


def _sample_inplace(rng: Pcg64, length: int, amount: int) -> list[int]:
    indices = list(range(length))
    for i in range(amount):
        j = rng.range_u32_inclusive(i, length - 1)
        indices[i], indices[j] = indices[j], indices[i]
    return indices[:amount]


def _sample_rejection(rng: Pcg64, length: int, amount: int) -> list[int]:
    low, range_, thresh = uniform_u32_params(0, length - 1)
    cache: set[int] = set()
    indices: list[int] = []
    for _ in range(amount):
        pos = rng.uniform_u32_sample(low, range_, thresh)
        while pos in cache:
            pos = rng.uniform_u32_sample(low, range_, thresh)
        cache.add(pos)
        indices.append(pos)
    return indices


def index_sample(rng: Pcg64, length: int, amount: int) -> list[int]:
    """``rand::seq::index::sample`` with rand 0.10's algorithm choice
    (Floyd's for small amount, else in-place partial shuffle, else
    rejection). Reference use: subsampler.rs:99 (ByReads)."""
    if amount > length:
        raise ValueError("amount > length")
    if amount < 163:
        c = ((1.6, 8.0 / 45.0), (10.0, 70.0 / 9.0))[length >= 500_000]
        m = c[0] * amount + c[1] * amount * amount
        if amount > 11 and length < m:
            return _sample_inplace(rng, length, amount)
        return _sample_floyd(rng, length, amount)
    c = (270.0, 330.0 / 9.0)[length >= 500_000]
    if length < c * amount:
        return _sample_inplace(rng, length, amount)
    return _sample_rejection(rng, length, amount)


# --- Vectorized jump-ahead (numpy, 32-bit limbs) ----------------------------
#
# The PCG64 core is s_{k+1} = A*s_k + C (mod 2^128). Therefore
#   s_k = A^k * s_0 + (A^k - 1)/(A - 1) * C
# and composing (A^a, C_a) ∘ (A^b, C_b) = (A^{a+b}, A^b*C_a + C_b) lets us
# compute s_k for arbitrary k in O(log k) 128-bit multiplies — i.e. the i-th
# one-pass Bernoulli decision is a pure function of (seed, i), so the
# one-pass sampler (fastx.rs:127-160) parallelizes with no sequential scan.

_N_LIMBS = 4  # 4 × 32-bit limbs = 128 bits


def _to_limbs(x: int) -> np.ndarray:
    return np.array([(x >> (32 * i)) & MASK32 for i in range(_N_LIMBS)], dtype=np.uint64)


def _mul128_vec(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(N,4)×(N,4) limb-wise 128-bit modular multiply, vectorized."""
    out = np.zeros_like(a)
    carry = np.zeros(a.shape[0], dtype=np.uint64)
    for k in range(_N_LIMBS):
        acc = carry.copy()
        carry = np.zeros_like(carry)
        for i in range(k + 1):
            prod = a[:, i] * b[:, k - i]  # ≤ (2^32-1)^2 < 2^64, no overflow
            lo = prod & MASK32
            hi = prod >> np.uint64(32)
            acc += lo
            carry += hi
        out[:, k] = acc & np.uint64(MASK32)
        carry += acc >> np.uint64(32)
    return out


def _add128_vec(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    out = np.zeros_like(a)
    carry = np.zeros(a.shape[0], dtype=np.uint64)
    for k in range(_N_LIMBS):
        s = a[:, k] + b[:, k] + carry
        out[:, k] = s & np.uint64(MASK32)
        carry = s >> np.uint64(32)
    return out


def pcg64_states_at(seed: int, indices: np.ndarray) -> np.ndarray:
    """State of Pcg64(seed) *after* (i+1) steps for each i in ``indices`` —
    i.e. the state whose XSL-RR output is the (i+1)-th ``next_u64`` (the
    draw consumed by row i's one-pass Bernoulli decision). Returns (N,4)
    uint64 limb array (32-bit limbs, little-endian)."""
    state0, incr = seed_from_u64(seed)
    s0 = ((state0 + incr) * PCG_MUL + incr) & MASK128  # constructor advance

    n = len(indices)
    # per-row transform (A_i, C_i) built by binary decomposition of (i+1)
    acc_a = np.tile(_to_limbs(1), (n, 1))
    acc_c = np.zeros((n, _N_LIMBS), dtype=np.uint64)
    step_a, step_c = PCG_MUL, incr  # transform for 1 step (as ints)
    k = np.asarray(indices, dtype=np.uint64) + np.uint64(1)
    max_k = int(k.max()) if n else 0
    bit = 0
    while (1 << bit) <= max_k:
        mask = ((k >> np.uint64(bit)) & np.uint64(1)).astype(bool)
        if mask.any():
            sa = np.tile(_to_limbs(step_a), (int(mask.sum()), 1))
            sc = np.tile(_to_limbs(step_c), (int(mask.sum()), 1))
            # compose: (acc ∘ step): A = step_a*acc_a ; C = step_a*acc_c + step_c
            acc_a[mask] = _mul128_vec(sa, acc_a[mask])
            acc_c[mask] = _add128_vec(_mul128_vec(sa, acc_c[mask]), sc)
        # square the step: (A,C) -> (A^2, A*C + C)
        step_c = (step_a * step_c + step_c) & MASK128
        step_a = (step_a * step_a) & MASK128
        bit += 1
    # s_k = A_k * s0 + C_k
    s0_l = np.tile(_to_limbs(s0), (n, 1))
    return _add128_vec(_mul128_vec(acc_a, s0_l), acc_c)


def _xsl_rr_vec(states: np.ndarray) -> np.ndarray:
    """Vectorized XSL-RR output over (N,4) limb states → (N,) uint64."""
    lo = states[:, 0] | (states[:, 1] << np.uint64(32))
    hi = states[:, 2] | (states[:, 3] << np.uint64(32))
    rot = (hi >> np.uint64(58)).astype(np.uint64)  # top 6 bits of the u128
    xsl = hi ^ lo
    # (x>>0)|(x<<0) == x, so masking the left-shift to 6 bits handles rot==0
    return ((xsl >> rot) | (xsl << ((np.uint64(64) - rot) & np.uint64(63)))).astype(
        np.uint64
    )


def pcg64_next_u64_at(seed: int, indices: np.ndarray) -> np.ndarray:
    """Vectorized: the (i+1)-th ``next_u64`` of Pcg64(seed) for each i."""
    if len(indices) == 0:
        return np.zeros(0, dtype=np.uint64)
    return _xsl_rr_vec(pcg64_states_at(seed, np.asarray(indices, dtype=np.uint64)))


def pcg64_bernoulli_keys(seed: int, indices: np.ndarray, p: float) -> np.ndarray:
    """Row i kept ⟺ the i-th sequential ``random_bool(p)`` draw of
    Pcg64(seed) is true — computed independently per row (jump-ahead)."""
    draws = pcg64_next_u64_at(seed, indices)
    return draws < np.uint64(bernoulli_p_int(p))


def derive_group_seed(seed: int, *parts: object) -> int:
    """Deterministic per-(source,bucket) seed: FNV-1a 64 over the parts.
    Recorded in lineage (north_rule: checkpoints carry the seed)."""
    h = 0xCBF29CE484222325
    for part in (seed, *parts):
        for b in str(part).encode("utf-8") + b"\x1f":
            h = ((h ^ b) * 0x100000001B3) & MASK64
    return h
