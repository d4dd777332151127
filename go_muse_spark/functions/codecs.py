"""Chunk codecs: XOR float compression + delta-of-delta timestamps
(north_rule L3), in a fully numpy-vectorized columnar layout.

The classic Gorilla bit layout (Pelkonen et al., VLDB 2015) interleaves
per-point control bits with variable-width payloads, which forces a
point-at-a-time encode/decode loop — fine in C, but the Python
interpreter loop was the single largest CPU consumer in the pipeline
(~1 us/point) and capped compression throughput at ~1 Mpts/s/core.

This engine stores the same information in SECTIONS, so every step is a
whole-chunk numpy operation (~30-100x faster, small L1/L2-resident
working sets):

values (float64 -> XOR chain), per chunk:
  [0] u8 version (=2)
  [1] u8 lz   leading-zero count shared by the chunk's nonzero XORs
  [2] u8 tz   trailing-zero count shared likewise
  [3:11]  u64 LE raw IEEE-754 bits of the first value
  bitmap  ceil((n-1)/8) bytes: bit i set iff xor_i != 0
  payload k * W bits (W = 64-lz-tz), MSB-first: (xor >> tz) for each
          nonzero xor, in order

timestamps (int64 epoch-us -> delta-of-delta, prev_delta starts 0):
  [0] u8 version (=2)
  [1] u8 W    zigzag(dod) bit width (max over the chunk)
  [2:10]  u64 LE first timestamp (two's complement)
  bitmap  ceil((n-1)/8) bytes: bit i set iff dod_i != 0
  payload k * W bits: zigzag(dod) for each nonzero dod

Same compression idea as Gorilla — XOR chains with leading/trailing-zero
windows, dod ~ 0 on regular buckets — but the window (lz, tz / W) is
chosen once per chunk instead of per point (Parquet-style bit-packing).
Dense regular tiers still cost ~1 bit/point on both columns; the whole
transform is exact (bit-for-bit round trip, incl. NaN/denormals/wraps:
every op is mod-2^64 linear).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "encode_floats",
    "decode_floats",
    "encode_timestamps",
    "decode_timestamps",
]

_U64 = np.uint64
_VERSION = 2


def _bitlen(x: np.ndarray) -> np.ndarray:
    """Vectorized bit length of uint64 values (0 -> 0).

    Exact: float64 log2 is computed on <=32-bit halves, where
    log2(2^k - 1) < k by far more than one ulp.
    """
    hi = (x >> _U64(32)).astype(np.float64)
    lo = (x & _U64(0xFFFFFFFF)).astype(np.float64)
    with np.errstate(divide="ignore"):
        bl_hi = np.where(hi > 0, np.floor(np.log2(np.maximum(hi, 1))) + 1, 0)
        bl_lo = np.where(lo > 0, np.floor(np.log2(np.maximum(lo, 1))) + 1, 0)
    return np.where(hi > 0, 32 + bl_hi, bl_lo).astype(np.int64)


def _pack_fixed(vals: np.ndarray, width: int) -> bytes:
    """Pack uint64 values into width-bit MSB-first fields."""
    if width == 0 or vals.size == 0:
        return b""
    shifts = np.arange(width - 1, -1, -1, dtype=_U64)
    bits = ((vals[:, None] >> shifts[None, :]) & _U64(1)).astype(np.uint8)
    return np.packbits(bits.ravel()).tobytes()


def _unpack_fixed(data: np.ndarray, k: int, width: int) -> np.ndarray:
    """Inverse of _pack_fixed -> uint64[k]."""
    if k == 0 or width == 0:
        return np.zeros(k, dtype=_U64)
    bits = np.unpackbits(data, count=k * width).reshape(k, width).astype(_U64)
    out = np.zeros(k, dtype=_U64)
    one = _U64(1)
    for j in range(width):
        out = (out << one) | bits[:, j]
    return out


def encode_floats(values: np.ndarray) -> bytes:
    """XOR-encode a float64 vector (sectioned layout above). Empty -> b""."""
    bits = np.ascontiguousarray(values, dtype=np.float64).view(_U64)
    n = bits.size
    if n == 0:
        return b""
    first = bits[:1].tobytes()  # 8 bytes LE
    if n == 1:
        return bytes([_VERSION, 0, 0]) + first
    xors = bits[:-1] ^ bits[1:]
    mask = xors != 0
    k = int(mask.sum())
    if k:
        nz = xors[mask]
        lz = int(64 - _bitlen(nz).max())
        low = nz & (_U64(0) - nz)  # lowest set bit
        tz = int((_bitlen(low) - 1).min())
        width = 64 - lz - tz
        payload = _pack_fixed(nz >> _U64(tz), width)
    else:
        lz = tz = 0
        payload = b""
    bitmap = np.packbits(mask).tobytes()
    return bytes([_VERSION, lz, tz]) + first + bitmap + payload


def decode_floats(data: bytes, n: int) -> np.ndarray:
    """Inverse of encode_floats; n = point count."""
    if n == 0:
        return np.empty(0, dtype=np.float64)
    buf = np.frombuffer(data, dtype=np.uint8)
    if buf[0] != _VERSION:
        raise ValueError(
            f"unsupported float-chunk version {int(buf[0])} (expected {_VERSION})"
        )
    lz, tz = int(buf[1]), int(buf[2])
    out = np.empty(n, dtype=_U64)
    out[0] = buf[3:11].view(_U64)[0]
    if n == 1:
        return out.view(np.float64)
    nb = (n - 1 + 7) // 8
    mask = np.unpackbits(buf[11 : 11 + nb], count=n - 1).astype(bool)
    k = int(mask.sum())
    vals = _unpack_fixed(buf[11 + nb :], k, 64 - lz - tz) << _U64(tz)
    out[1:] = 0
    out[1:][mask] = vals
    return np.bitwise_xor.accumulate(out).view(np.float64)


def encode_timestamps(ts_us: np.ndarray) -> bytes:
    """Delta-of-delta-encode an int64 vector (sectioned layout above).

    All arithmetic is mod 2^64 (numpy wraparound), so extreme int64
    inputs round-trip exactly.
    """
    ts = np.ascontiguousarray(ts_us, dtype=np.int64)
    n = ts.size
    if n == 0:
        return b""
    first = ts[:1].tobytes()
    if n == 1:
        return bytes([_VERSION, 0]) + first
    deltas = ts[1:].view(_U64) - ts[:-1].view(_U64)
    dods = np.empty_like(deltas)
    dods[0] = deltas[0]
    dods[1:] = deltas[1:] - deltas[:-1]
    signed = dods.view(np.int64)
    zig = ((signed << np.int64(1)) ^ (signed >> np.int64(63))).view(_U64)
    mask = zig != 0
    k = int(mask.sum())
    if k:
        nz = zig[mask]
        width = int(_bitlen(nz).max())
        payload = _pack_fixed(nz, width)
    else:
        width = 0
        payload = b""
    bitmap = np.packbits(mask).tobytes()
    return bytes([_VERSION, width]) + first + bitmap + payload


def decode_timestamps(data: bytes, n: int) -> np.ndarray:
    """Inverse of encode_timestamps; n = point count."""
    if n == 0:
        return np.empty(0, dtype=np.int64)
    buf = np.frombuffer(data, dtype=np.uint8)
    if buf[0] != _VERSION:
        raise ValueError(
            f"unsupported timestamp-chunk version {int(buf[0])} "
            f"(expected {_VERSION})"
        )
    width = int(buf[1])
    first = buf[2:10].view(np.int64)[0]
    if n == 1:
        return np.array([first], dtype=np.int64)
    nb = (n - 1 + 7) // 8
    mask = np.unpackbits(buf[10 : 10 + nb], count=n - 1).astype(bool)
    k = int(mask.sum())
    zig = np.zeros(n - 1, dtype=_U64)
    zig[mask] = _unpack_fixed(buf[10 + nb :], k, width)
    dods = ((zig >> _U64(1)).view(np.int64)) ^ -((zig & _U64(1)).view(np.int64))
    deltas = np.cumsum(dods.view(_U64), dtype=_U64)
    out = np.empty(n, dtype=_U64)
    out[0] = np.int64(first).astype(_U64)
    out[1:] = out[0] + np.cumsum(deltas, dtype=_U64)
    return out.view(np.int64)
