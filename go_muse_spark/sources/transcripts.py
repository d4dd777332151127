"""Deterministic synthetic transcript corpus (FIXTURES.md §F1).

Input shape per BASELINE.json input_hint:
    transcripts(conv_id string, turn_idx int, role string,
                text string, tool string, ts timestamp)

Properties by design:
  * heavy-tailed per-conversation turn counts (a few hot convs) to
    exercise skew handling / salting;
  * exponential inter-turn gaps with inserted multi-minute silences to
    exercise gap-fill;
  * text is a pure function of (conv_id, turn_idx) so the per-turn
    text-equality invariant is checkable regardless of generation or
    partition order;
  * fully seeded numpy, no wall-clock — same args => byte-identical
    corpus.

Generation is vectorized numpy -> pyarrow; at bench scales (<=10^7
turns in-sandbox) this is seconds. At real 10^12-turn scale the same
per-conv logic would run as a Spark range->mapInPandas generator; the
schema and invariants are identical.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

__all__ = ["generate_transcripts", "write_transcripts", "deterministic_text", "SCHEMA_DDL"]

SCHEMA_DDL = (
    "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
)

_ROLES = np.array(["user", "assistant", "tool"])
_TOOLS = np.array(["search", "exec", "browse", "calc"])
_EPOCH_2025 = np.datetime64("2025-01-01T00:00:00", "us").astype("int64")  # us


def deterministic_text(conv: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """text is a pure function of (conv_id, turn_idx): "c{c}-t{i}-w{h}"."""
    h = (conv.astype(np.int64) * 1_000_003 + idx.astype(np.int64) * 7919) % 99991
    return np.char.add(
        np.char.add(
            np.char.add("c", conv.astype("U12")),
            np.char.add("-t", idx.astype("U12")),
        ),
        np.char.add("-w", h.astype("U8")),
    )


def generate_transcripts(
    n_convs: int = 200,
    seed: int = 42,
    hot_frac: float = 0.01,
    hot_turns: int = 20_000,
    span_days: float = 2.0,
    mean_gap_s: float = 20.0,
) -> pa.Table:
    """Build the corpus as one Arrow table (sorted by conv_id, turn_idx)."""
    rng = np.random.default_rng(seed)

    # heavy-tailed per-conv turn counts: 80% small, 19% medium, ~1% hot
    u = rng.random(n_convs)
    counts = np.where(
        u < 0.80,
        rng.integers(5, 51, n_convs),
        rng.integers(51, 501, n_convs),
    )
    n_hot = max(1, int(round(hot_frac * n_convs)))
    hot_ids = rng.choice(n_convs, size=n_hot, replace=False)
    counts[hot_ids] = rng.integers(hot_turns // 2, hot_turns + 1, n_hot)
    counts = counts.astype(np.int64)
    total = int(counts.sum())

    conv_of_turn = np.repeat(np.arange(n_convs, dtype=np.int64), counts)
    turn_idx = np.concatenate([np.arange(c, dtype=np.int64) for c in counts])

    # timestamps: conv start uniform in span; exponential inter-turn gaps
    # with ~2% inserted silences (mean 10 min) for gap-fill coverage
    starts_us = (rng.random(n_convs) * span_days * 86_400e6).astype(np.int64)
    gaps_s = rng.exponential(mean_gap_s, total)
    silent = rng.random(total) < 0.02
    gaps_s = gaps_s + silent * rng.exponential(600.0, total)
    gaps_s[turn_idx == 0] = 0.0
    # cumulative per conv: global cumsum minus cumsum at each conv start
    cum = np.cumsum(gaps_s * 1e6).astype(np.int64)
    first_of_conv = np.zeros(total, dtype=bool)
    first_of_conv[np.cumsum(counts)[:-1]] = True
    first_of_conv[0] = True
    base = np.repeat(cum[first_of_conv], counts)
    ts_us = _EPOCH_2025 + np.repeat(starts_us, counts) + (cum - base)

    # roles cycle user/assistant; every 7th turn is a tool call
    role_idx = np.where(turn_idx % 7 == 3, 2, turn_idx % 2).astype(np.int64)
    roles = _ROLES[role_idx]
    tools = np.where(role_idx == 2, _TOOLS[conv_of_turn % len(_TOOLS)], "")

    conv_ids = np.char.add("c", np.char.zfill(conv_of_turn.astype("U12"), 8))
    text = deterministic_text(conv_of_turn, turn_idx)

    return pa.table(
        {
            "conv_id": pa.array(conv_ids, pa.string()),
            "turn_idx": pa.array(turn_idx, pa.int32()),
            "role": pa.array(roles, pa.string()),
            "text": pa.array(text, pa.string()),
            "tool": pa.array(tools, pa.string()),
            "ts": pa.array(ts_us, pa.timestamp("us")),
        }
    )


def write_transcripts(path: str, n_files: int = 1, **kwargs) -> str:
    """Generate and write the corpus as parquet; returns the path.

    n_files > 1 writes a directory of part files (row-sliced) so a local
    Spark scan parallelizes the way a many-file cluster dataset would —
    a single 40 MB file is otherwise one scan task regardless of cores.
    """
    table = generate_transcripts(**kwargs)
    if n_files <= 1:
        pq.write_table(table, path, row_group_size=1_000_000)
        return path
    os.makedirs(path, exist_ok=True)
    n = table.num_rows
    step = (n + n_files - 1) // n_files
    for i, lo in enumerate(range(0, n, step)):
        pq.write_table(
            table.slice(lo, step),
            os.path.join(path, f"part-{i:05d}.parquet"),
            row_group_size=200_000,
        )
    return path
