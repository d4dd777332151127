"""Deterministic fake-pixel arithmetic, expressible in BOTH engines.

The sandbox has no media codecs, so the multimodal operators' decode
step is a stub. Round 2 seeded it with splitmix64 (mod-2^64), which
DuckDB cannot replay (UBIGINT `*` errors on overflow instead of
wrapping) — so the two feature queries were rows-only. This module
replaces the mixer with a two-round LCG over the prime field
P = 1e9+7 (the same family `functions/text.py` already uses for
hyperplane weights): every product stays under 2^63 on BIGINT, so the
identical arithmetic runs in numpy (Spark side, batched int64) and in
DuckDB SQL (oracle side), making the stub features value-checkable.

Contract shared by both sides:
  seed(payload)       = Horner fold of the first 8 payload bytes mod P
                        (byte 0 least significant; missing bytes = 0)
  frame_seed(s, f)    = (s*M4 + f*M1 + M3) mod P
  pixel(s, p)         = (((s*M1 + p*M2 + M3) mod P) * M4 + C2) mod P,
                        taken mod 256 -> uint8 pixel value
Payloads in the contract queries are UTF-8 bytes of ASCII text, so the
SQL side can read byte i as ascii(substr(text, i+1, 1)).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "P",
    "M1",
    "M2",
    "M3",
    "M4",
    "C2",
    "np_seeds",
    "np_frame_seeds",
    "np_pixels",
    "sql_seed",
    "sql_frame_seed",
    "sql_pixel",
]

P = 1_000_000_007
M1 = 747_796_405
M2 = 277_803_737
M3 = 374_761_393
M4 = 668_265_263
C2 = 104_729


# ------------------------------------------------------------- numpy side


def _seed_one(payload) -> int:
    b = bytes(payload)[:8].ljust(8, b"\0")
    s = 0
    for byte in reversed(b):  # byte 0 ends least significant
        s = (s * 256 + byte) % P
    return s


def np_seeds(payloads, m: int) -> np.ndarray:
    """(m,) int64 content seeds in [0, P)."""
    return np.fromiter((_seed_one(p) for p in payloads), np.int64, count=m)


def np_frame_seeds(seeds: np.ndarray, frame_idx: np.ndarray) -> np.ndarray:
    return (seeds * M4 + frame_idx * M1 + M3) % P


def np_pixels(seeds: np.ndarray, width: int, height: int) -> np.ndarray:
    """(m,) int64 seeds -> (m, H, W, 3) uint8, one vectorized pass.

    seeds < P and all constants < P keep every int64 product < 2^63 —
    identical wraparound-free arithmetic to the SQL twin below."""
    n_pix = height * width * 3
    ctr = np.arange(n_pix, dtype=np.int64)[None, :]
    u = (seeds[:, None] * M1 + ctr * M2 + M3) % P
    v = (u * M4 + C2) % P
    return (v % 256).astype(np.uint8).reshape(-1, height, width, 3)


# --------------------------------------------------------------- SQL side


def sql_seed(text_col: str = "text") -> str:
    """Horner fold of the first 8 bytes (ASCII text) mod P — DuckDB.

    substr past the end yields '' and ascii('') = 0, which matches the
    numpy side's zero padding."""
    expr = "cast(0 as bigint)"  # BIGINT accumulator (INT32 would overflow)
    for i in range(7, -1, -1):  # byte 7 first, byte 0 last (Horner)
        byte = f"ascii(substr({text_col}, {i + 1}, 1))"
        expr = f"(({expr}) * 256 + {byte}) % {P}"
    return expr


def sql_frame_seed(seed: str, frame_idx: str) -> str:
    return (
        f"(cast({seed} as bigint) * {M4}"
        f" + cast({frame_idx} as bigint) * {M1} + {M3}) % {P}"
    )


def sql_pixel(seed: str, p: str) -> str:
    u = (
        f"((cast({seed} as bigint) * {M1}"
        f" + cast({p} as bigint) * {M2} + {M3}) % {P})"
    )
    return f"((({u}) * {M4} + {C2}) % {P}) % 256"
