"""Gorilla-style time-series compression (public algorithm: Pelkonen et al.,
"Gorilla: A Fast, Scalable, In-Memory Time Series Database", VLDB 2015).

Two codecs over per-group metric streams (north_rule: "Gorilla XOR /
delta-of-delta compression of the metric streams stored back"):

- ``xor_encode``/``xor_decode``  — float64 values, XOR-with-previous with
  leading/trailing-zero window reuse (Gorilla §4.1.2).
- ``dod_encode``/``dod_decode``  — int64 timestamps/counters,
  delta-of-delta with Gorilla's variable-width buckets (§4.1.1) extended
  with a 64-bit escape so arbitrary int64 streams round-trip.

Streams here are per-(source, tier) rollup series — thousands of points
after aggregation — so a scalar bit-loop is not a hot path (SURVEY §7.M6);
the distributed part is ``applyInPandas`` over groups.
"""

from __future__ import annotations

import numpy as np

_MASK64 = (1 << 64) - 1


class _BitWriter:
    __slots__ = ("buf", "acc", "nbits")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, width: int) -> None:
        self.acc = (self.acc << width) | (value & ((1 << width) - 1))
        self.nbits += width
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def getvalue(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            return bytes(self.buf) + bytes([(self.acc << pad) & 0xFF])
        return bytes(self.buf)


class _BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0

    def read(self, width: int) -> int:
        out = 0
        remaining = width
        while remaining:
            byte_i, bit_i = divmod(self.pos, 8)
            avail = 8 - bit_i
            take = min(avail, remaining)
            chunk = (self.data[byte_i] >> (avail - take)) & ((1 << take) - 1)
            out = (out << take) | chunk
            self.pos += take
            remaining -= take
        return out


# --- XOR float codec ---------------------------------------------------------


def xor_encode(values: np.ndarray) -> bytes:
    """Gorilla XOR compression of a float64 series. Layout:
    [u32 count][first value 64b][per-point control+bits]."""
    vals = np.asarray(values, dtype=np.float64).view(np.uint64)
    w = _BitWriter()
    w.write(len(vals), 32)
    if len(vals) == 0:
        return w.getvalue()
    w.write(int(vals[0]), 64)
    prev = int(vals[0])
    prev_lead, prev_trail = 65, 65  # invalid → force a new window first time
    for v in map(int, vals[1:]):
        x = prev ^ v
        prev = v
        if x == 0:
            w.write(0, 1)
            continue
        lead = 64 - x.bit_length()
        trail = (x & -x).bit_length() - 1
        lead = min(lead, 31)  # 5-bit field
        if prev_lead <= lead and prev_trail <= trail:
            # reuse previous meaningful-bit window: '10'
            w.write(0b10, 2)
            meaningful = 64 - prev_lead - prev_trail
            w.write(x >> prev_trail, meaningful)
        else:
            # new window: '11' + 5b leading + 6b length + bits
            w.write(0b11, 2)
            meaningful = 64 - lead - trail
            w.write(lead, 5)
            w.write(meaningful, 6)  # 1..64 (64 encoded as 0 is impossible: x!=0 → ≤64; use 6 bits, 64→0)
            w.write(x >> trail, meaningful if meaningful < 64 else 64)
            prev_lead, prev_trail = lead, trail
    return w.getvalue()


def xor_decode(blob: bytes) -> np.ndarray:
    r = _BitReader(blob)
    n = r.read(32)
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out.view(np.float64)
    prev = r.read(64)
    out[0] = prev
    lead, trail = 0, 0
    for i in range(1, n):
        if r.read(1) == 0:
            out[i] = prev
            continue
        if r.read(1) == 0:  # '10' reuse window
            meaningful = 64 - lead - trail
            x = r.read(meaningful) << trail
        else:  # '11' new window
            lead = r.read(5)
            meaningful = r.read(6)
            if meaningful == 0:
                meaningful = 64
            trail = 64 - lead - meaningful
            x = r.read(meaningful) << trail
        prev ^= x
        out[i] = prev
    return out.view(np.float64)


# --- delta-of-delta int codec ------------------------------------------------

def _wrap64(x: int) -> int:
    """Two's-complement wrap to signed 64-bit (delta arithmetic must wrap so
    arbitrary int64 streams round-trip)."""
    x &= _MASK64
    return x - (1 << 64) if x >= (1 << 63) else x


# (prefix, prefix_bits, payload_bits); payload stores dod + 2^(bits-1)-ish
_DOD_BUCKETS = (
    (0b10, 2, 7),    # [-63, 64]
    (0b110, 3, 9),   # [-255, 256]
    (0b1110, 4, 12),  # [-2047, 2048]
    (0b11110, 5, 32),  # [-2^31+1, 2^31]
    (0b11111, 5, 64),  # escape: raw 64-bit two's complement
)


def dod_encode(values: np.ndarray) -> bytes:
    """Delta-of-delta compression of an int64 series. Layout:
    [u32 count][first 64b][first delta 64b][per-point dod]."""
    vals = np.asarray(values, dtype=np.int64)
    w = _BitWriter()
    w.write(len(vals), 32)
    if len(vals) == 0:
        return w.getvalue()
    w.write(int(vals[0]) & _MASK64, 64)
    if len(vals) == 1:
        return w.getvalue()
    prev_delta = _wrap64(int(vals[1]) - int(vals[0]))
    w.write(prev_delta & _MASK64, 64)
    prev = int(vals[1])
    for v in map(int, vals[2:]):
        delta = _wrap64(v - prev)
        dod = _wrap64(delta - prev_delta)
        prev, prev_delta = v, delta
        if dod == 0:
            w.write(0, 1)
            continue
        for prefix, pbits, bits in _DOD_BUCKETS:
            if bits == 64:
                w.write(prefix, pbits)
                w.write(dod & _MASK64, 64)
                break
            lo, hi = -(1 << (bits - 1)) + 1, 1 << (bits - 1)
            if lo <= dod <= hi:
                w.write(prefix, pbits)
                w.write(dod + (1 << (bits - 1)) - 1, bits)  # map lo..hi → 0..2^bits-1
                break
    return w.getvalue()


def dod_decode(blob: bytes) -> np.ndarray:
    r = _BitReader(blob)
    n = r.read(32)
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    first = r.read(64)
    out[0] = np.int64(np.uint64(first))
    if n == 1:
        return out
    d = r.read(64)
    prev_delta = d - (1 << 64) if d >= (1 << 63) else d
    prev = _wrap64(int(out[0]) + prev_delta)
    out[1] = prev
    for i in range(2, n):
        if r.read(1) == 0:
            dod = 0
        else:
            nbits = 1
            while nbits < 4 and r.read(1) == 1:
                nbits += 1
            if nbits < 4:
                bits = _DOD_BUCKETS[nbits - 1][2]
                dod = r.read(bits) - ((1 << (bits - 1)) - 1)
            elif r.read(1) == 0:  # '11110'
                bits = 32
                dod = r.read(bits) - ((1 << (bits - 1)) - 1)
            else:  # '11111' raw 64
                raw = r.read(64)
                dod = raw - (1 << 64) if raw >= (1 << 63) else raw
        prev_delta = _wrap64(prev_delta + dod)
        prev = _wrap64(prev + prev_delta)
        out[i] = prev
    return out
