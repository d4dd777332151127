"""Gorilla-style chunk codecs: XOR float compression + delta-of-delta
timestamps (north_rule L3). Public algorithm per Pelkonen et al.,
"Gorilla: A Fast, Scalable, In-Memory Time Series Database" (VLDB 2015).

Pure Python/numpy — runs inside Arrow-batched pandas UDFs at CHUNK
granularity (one encode call per few-thousand-point chunk, never per Spark
row). Bit layout (this engine's own, round-trip-exact):

values (float64 -> XOR chain):
  first value: 64 raw bits of the IEEE-754 pattern
  then per value, xor = prev ^ cur:
    xor == 0                -> '0'
    fits previous window    -> '10' + meaningful bits in the prev window
    else                    -> '11' + 5b leading-zero count (clamped 31)
                               + 6b (meaningful_len - 1) + meaningful bits

timestamps (int64 epoch-us -> delta-of-delta chain, prev_delta starts 0):
  first ts: 64 raw bits
  then per ts, dod = delta - prev_delta:
    dod == 0          -> '0'
    in [-63, 64]      -> '10'   + 7b  (dod + 63)
    in [-255, 256]    -> '110'  + 9b  (dod + 255)
    in [-2047, 2048]  -> '1110' + 12b (dod + 2047)
    else              -> '1111' + 64b two's-complement raw

Regular tier buckets make dod = 0 for nearly every point (~1 bit/ts), and
smooth counts keep XOR windows narrow — the whole point of running this
AFTER rollup+gapfill, when the data is dense and regular.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "encode_floats",
    "decode_floats",
    "encode_timestamps",
    "decode_timestamps",
]

_MASK64 = (1 << 64) - 1


class BitWriter:
    __slots__ = ("buf", "acc", "nacc")

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, value: int, nbits: int) -> None:
        self.acc = ((self.acc << nbits) | (value & ((1 << nbits) - 1)))
        self.nacc += nbits
        while self.nacc >= 8:
            self.nacc -= 8
            self.buf.append((self.acc >> self.nacc) & 0xFF)
        self.acc &= (1 << self.nacc) - 1

    def getvalue(self) -> bytes:
        if self.nacc:
            return bytes(self.buf) + bytes([(self.acc << (8 - self.nacc)) & 0xFF])
        return bytes(self.buf)


class BitReader:
    __slots__ = ("data", "pos")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit cursor

    def read(self, nbits: int) -> int:
        out = 0
        pos = self.pos
        data = self.data
        remaining = nbits
        while remaining:
            byte_i, bit_i = divmod(pos, 8)
            take = min(8 - bit_i, remaining)
            chunk = (data[byte_i] >> (8 - bit_i - take)) & ((1 << take) - 1)
            out = (out << take) | chunk
            pos += take
            remaining -= take
        self.pos = pos
        return out


def encode_floats(values: np.ndarray) -> bytes:
    """Gorilla XOR-encode a float64 vector. Empty -> b""."""
    bits = np.ascontiguousarray(values, dtype=np.float64).view(np.uint64)
    n = bits.size
    if n == 0:
        return b""
    w = BitWriter()
    prev = int(bits[0])
    w.write(prev, 64)
    # the XOR chain as plain ints; the control-flow is inherently
    # sequential (window reuse depends on the previous decision)
    xors = (bits[:-1] ^ bits[1:]).tolist() if n > 1 else []
    win_lz, win_tz = -1, -1  # no previous window
    for xor in xors:
        if xor == 0:
            w.write(0, 1)
            continue
        lz = 64 - xor.bit_length()
        if lz > 31:
            lz = 31
        tz = (xor & -xor).bit_length() - 1
        if win_lz >= 0 and lz >= win_lz and tz >= win_tz:
            w.write(0b10, 2)
            w.write(xor >> win_tz, 64 - win_lz - win_tz)
        else:
            meaningful = 64 - lz - tz
            w.write(0b11, 2)
            w.write(lz, 5)
            w.write(meaningful - 1, 6)
            w.write(xor >> tz, meaningful)
            win_lz, win_tz = lz, tz
    return w.getvalue()


def decode_floats(data: bytes, n: int) -> np.ndarray:
    """Inverse of encode_floats; n = point count."""
    if n == 0:
        return np.empty(0, dtype=np.float64)
    r = BitReader(data)
    out = np.empty(n, dtype=np.uint64)
    cur = r.read(64)
    out[0] = cur
    win_lz = win_tz = -1
    for i in range(1, n):
        if r.read(1) == 0:
            out[i] = cur
            continue
        if r.read(1) == 0:  # '10' — reuse window
            meaningful = 64 - win_lz - win_tz
            xor = r.read(meaningful) << win_tz
        else:  # '11' — new window
            win_lz = r.read(5)
            meaningful = r.read(6) + 1
            win_tz = 64 - win_lz - meaningful
            xor = r.read(meaningful) << win_tz
        cur ^= xor
        out[i] = cur
    return out.view(np.float64)


_DOD_RANGES = (
    (64, 0b10, 2, 7, 63),
    (256, 0b110, 3, 9, 255),
    (2048, 0b1110, 4, 12, 2047),
)


def encode_timestamps(ts_us: np.ndarray) -> bytes:
    """Delta-of-delta-encode an int64 epoch-microsecond vector."""
    ts = np.ascontiguousarray(ts_us, dtype=np.int64)
    n = ts.size
    if n == 0:
        return b""
    w = BitWriter()
    w.write(int(ts[0]) & _MASK64, 64)
    # all arithmetic mod 2^64 (two's complement) so extreme int64 inputs
    # round-trip exactly instead of overflowing
    vals = [t & _MASK64 for t in ts.tolist()]
    prev_delta = 0
    for i in range(1, n):
        delta = (vals[i] - vals[i - 1]) & _MASK64
        dod = (delta - prev_delta) & _MASK64
        prev_delta = delta
        if dod >= 1 << 63:
            dod -= 1 << 64
        if dod == 0:
            w.write(0, 1)
            continue
        for hi, ctrl, ctrl_bits, val_bits, offset in _DOD_RANGES:
            if -hi + 1 <= dod <= hi:
                w.write(ctrl, ctrl_bits)
                w.write(dod + offset, val_bits)
                break
        else:
            w.write(0b1111, 4)
            w.write(dod & _MASK64, 64)
    return w.getvalue()


def decode_timestamps(data: bytes, n: int) -> np.ndarray:
    """Inverse of encode_timestamps; n = point count."""
    if n == 0:
        return np.empty(0, dtype=np.int64)
    r = BitReader(data)
    out = np.empty(n, dtype=np.int64)

    def to_signed(u: int) -> int:
        return u - (1 << 64) if u >= 1 << 63 else u

    ts = r.read(64)  # unsigned mod-2^64 accumulator
    out[0] = to_signed(ts)
    delta = 0
    for i in range(1, n):
        if r.read(1) == 0:
            dod = 0
        elif r.read(1) == 0:
            dod = r.read(7) - 63
        elif r.read(1) == 0:
            dod = r.read(9) - 255
        elif r.read(1) == 0:
            dod = r.read(12) - 2047
        else:
            dod = r.read(64)
        delta = (delta + dod) & _MASK64
        ts = (ts + delta) & _MASK64
        out[i] = to_signed(ts)
    return out
