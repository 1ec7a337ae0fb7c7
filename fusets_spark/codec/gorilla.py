"""Gorilla-style compressed point blocks: delta-of-delta timestamps + XOR
float64 values (Pelkonen et al., "Gorilla: A Fast, Scalable, In-Memory Time
Series Database", VLDB 2015).

One block = one (series, coarse bucket) worth of points, encoded inside a
pandas/Arrow UDF (numpy bit-packing, no per-row Python in the Spark plan).
The reference stores raw float arrays (xarray); this codec is the north-rule
addition for 100 TB retention tiers.

Encode is fully vectorized: every point contributes a few (value, width)
codewords; codewords are scattered into a flat bit array with numpy
(repeat/cumsum indexing) and packed with np.packbits. Decode is a sequential
bit reader (variable-length codes are inherently serial); it is only on the
verification / point-restore path.

Bit format (MSB-first):
  header: u32 n_points | i64 first_ts | f64 first_value (raw bits)
  per subsequent point:
    timestamp delta-of-delta D (zigzag-free, signed ranges as in the paper):
      '0'                          D == 0
      '10'   + 7  bits             D in [-63, 64]
      '110'  + 9  bits             D in [-255, 256]
      '1110' + 12 bits             D in [-2047, 2048]
      '11110' + 32 bits            D in [-(2^31-1), 2^31]
      '11111' + 64 bits            raw two's-complement
    value XOR with previous value:
      '0'                          XOR == 0
      '10'   + meaningful bits     same leading/length window as previous
      '11'   + 5 bits leading + 6 bits (len-1) + len bits
"""

from __future__ import annotations

import numpy as np

_RANGES = ((7, 64), (9, 256), (12, 2048), (32, 2**31))  # (bits, bias upper bound)
_FALLBACK_PREFIX = (1 << (len(_RANGES) + 1)) - 1  # '1' * (len+1)
_FALLBACK_WIDTH = len(_RANGES) + 1


class _BitWriter:
    """Collect (value, width) codewords; pack once with numpy at the end."""

    __slots__ = ("vals", "widths")

    def __init__(self) -> None:
        self.vals: list[int] = []
        self.widths: list[int] = []

    def write(self, value: int, width: int) -> None:
        self.vals.append(value & ((1 << width) - 1) if width < 64 else value & 0xFFFFFFFFFFFFFFFF)
        self.widths.append(width)

    def extend(self, values: np.ndarray, widths: np.ndarray) -> None:
        self.vals.extend(int(v) for v in values)
        self.widths.extend(int(w) for w in widths)

    def pack(self) -> bytes:
        vals = np.asarray(self.vals, dtype=np.uint64)
        widths = np.asarray(self.widths, dtype=np.int64)
        total = int(widths.sum())
        if total == 0:
            return b""
        ends = np.cumsum(widths)
        starts = ends - widths
        row = np.repeat(np.arange(len(vals)), widths)
        bitpos = np.arange(total, dtype=np.int64) - starts[row]
        shift = (widths[row] - 1 - bitpos).astype(np.uint64)
        bits = ((vals[row] >> shift) & np.uint64(1)).astype(np.uint8)
        return np.packbits(bits).tobytes()


class _BitReader:
    __slots__ = ("bits", "pos")

    def __init__(self, data: bytes) -> None:
        self.bits = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
        self.pos = 0

    def read(self, width: int) -> int:
        v = 0
        p = self.pos
        for b in self.bits[p : p + width]:
            v = (v << 1) | int(b)
        self.pos = p + width
        return v

    def read_bit(self) -> int:
        b = int(self.bits[self.pos])
        self.pos += 1
        return b


def _encode_dod(w: _BitWriter, dod: np.ndarray) -> None:
    for d in dod:
        d = int(d)
        if d == 0:
            w.write(0, 1)
            continue
        for i, (bits, ub) in enumerate(_RANGES):
            if -(ub - 1) <= d <= ub:
                w.write(2 ** (i + 2) - 2, i + 2)  # prefix '10' / '110' / '1110'
                w.write(d + (ub - 1), bits)  # bias to unsigned
                break
        else:
            w.write(_FALLBACK_PREFIX, _FALLBACK_WIDTH)
            w.write(d & 0xFFFFFFFFFFFFFFFF, 64)


def _decode_dod(r: _BitReader) -> int:
    if r.read_bit() == 0:
        return 0
    for i, (bits, ub) in enumerate(_RANGES):
        if r.read_bit() == 0:
            return r.read(bits) - (ub - 1)
    return _to_signed64(r.read(64))


def _to_signed64(v: int) -> int:
    return v - (1 << 64) if v >= (1 << 63) else v


def encode_block(ts: np.ndarray, values: np.ndarray) -> bytes:
    """Encode sorted int64 timestamps (any unit, typically epoch seconds) and
    float64 values into one Gorilla block."""
    ts = np.ascontiguousarray(ts, dtype=np.int64)
    values = np.ascontiguousarray(values, dtype=np.float64)
    n = len(ts)
    assert len(values) == n
    w = _BitWriter()
    w.write(n, 32)
    if n == 0:
        return w.pack()
    w.write(int(ts[0]) & 0xFFFFFFFFFFFFFFFF, 64)
    vbits = values.view(np.uint64)
    w.write(int(vbits[0]), 64)
    if n > 1:
        deltas = np.diff(ts)
        dod = np.empty_like(deltas)
        dod[0] = deltas[0]  # first delta encoded as DoD with prev_delta = 0
        dod[1:] = np.diff(deltas)
        _encode_dod(w, dod)
        # value stream
        prev_lead, prev_len = -1, -1
        prev = int(vbits[0])
        for cur in vbits[1:]:
            cur = int(cur)
            x = prev ^ cur
            prev = cur
            if x == 0:
                w.write(0, 1)
                continue
            lead = 64 - x.bit_length()
            trail = (x & -x).bit_length() - 1
            if lead > 31:
                lead = 31
            mean_len = 64 - lead - trail
            if (
                prev_lead >= 0
                and lead >= prev_lead
                and trail >= (64 - prev_lead - prev_len)
            ):
                w.write(0b10, 2)
                w.write(x >> (64 - prev_lead - prev_len), prev_len)
            else:
                w.write(0b11, 2)
                w.write(lead, 5)
                w.write(mean_len - 1, 6)
                w.write(x >> trail, mean_len)
                prev_lead, prev_len = lead, mean_len
    return w.pack()


def decode_block(data: bytes) -> tuple[np.ndarray, np.ndarray]:
    """Inverse of encode_block -> (ts int64, values float64)."""
    r = _BitReader(data)
    n = r.read(32)
    ts = np.empty(n, dtype=np.int64)
    vals = np.empty(n, dtype=np.uint64)
    if n == 0:
        return ts, vals.view(np.float64)
    ts[0] = _to_signed64(r.read(64))
    vals[0] = r.read(64)
    if n > 1:
        # timestamps
        delta = 0
        t = int(ts[0])
        for i in range(1, n):
            delta += _decode_dod(r)
            t += delta
            ts[i] = t
        # values
        prev = int(vals[0])
        prev_lead, prev_len = -1, -1
        for i in range(1, n):
            if r.read_bit() == 0:
                vals[i] = prev
                continue
            if r.read_bit() == 0:
                x = r.read(prev_len) << (64 - prev_lead - prev_len)
            else:
                prev_lead = r.read(5)
                prev_len = r.read(6) + 1
                x = r.read(prev_len) << (64 - prev_lead - prev_len)
            prev ^= x
            vals[i] = prev
    return ts, vals.view(np.float64)
