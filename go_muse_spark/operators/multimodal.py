"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as `binary` columns with a
struct of typed metadata. The Spark-side machinery — schema, partition
sizing, Arrow batch shape, mapInPandas signatures — is real and tested;
the actual media decoding is STUBBED (the sandbox has no image/audio
libraries): `decode_image` raises NotImplementedError unless
`fake=True`, which substitutes a deterministic content-hash-seeded
decode so the downstream feature pipeline is exercisable end-to-end.

Scale notes: media rows are wide — keep payloads in their own table keyed
by content hash, dedupe BEFORE decode (exact_dedup on the hash), and size
`spark.sql.files.maxPartitionBytes` so one partition holds O(100) media
rows, not O(100k) text rows' worth.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from go_muse_spark.functions import fakepx as PX

__all__ = [
    "MEDIA_SCHEMA",
    "with_content_hash",
    "decode_image_features",
    "frame_sample_plan",
    "extract_frame_features",
]

MEDIA_SCHEMA = (
    "media_id string, kind string, payload binary, "
    "meta struct<width:int, height:int, mime:string, duration_ms:int>"
)


def with_content_hash(media: DataFrame) -> DataFrame:
    """Content address for dedupe-before-decode (sha2 over the payload)."""
    return media.withColumn("content_hash", F.sha2(F.col("payload"), 256))


def _fake_decode_batch(
    seeds: np.ndarray, width: int, height: int
) -> np.ndarray:
    """Deterministic stand-in decode for a batch of same-shape images:
    (m,) int64 content seeds -> (m, H, W, 3) uint8 pixels, one vectorized
    counter-based mod-P LCG over the whole batch (no per-item RNG loop).
    The arithmetic lives in functions/fakepx.py because the DuckDB
    oracle replays it bit-for-bit in SQL — that is what makes the
    feature queries value-checkable rather than rows-only."""
    return PX.np_pixels(seeds, width, height)


def _payload_seeds(payloads, m: int) -> np.ndarray:
    """(m,) int64 content seeds: first 8 payload bytes, Horner mod P."""
    return PX.np_seeds(payloads, m)


_N_STUB_FEATURES = 7  # 3 channel means + 4 quadrant means


def _channel_quadrant_features(imgs: np.ndarray, h: int, w: int) -> np.ndarray:
    """(g, H, W, 3) uint8 -> (g, 7) float64: channel + quadrant means,
    one batched reduction (shared by the image and frame feature ops)."""
    f0 = imgs.mean(axis=(1, 2)) / 255.0
    qs = (
        np.stack(
            [
                imgs[:, : h // 2, : w // 2].mean(axis=(1, 2, 3)),
                imgs[:, : h // 2, w // 2 :].mean(axis=(1, 2, 3)),
                imgs[:, h // 2 :, : w // 2].mean(axis=(1, 2, 3)),
                imgs[:, h // 2 :, w // 2 :].mean(axis=(1, 2, 3)),
            ],
            axis=1,
        )
        / 255.0
    )
    return np.concatenate([f0, qs], axis=1)


def decode_image_features(
    media: DataFrame, n_features: int = 8, fake: bool = False
) -> DataFrame:
    """payload binary -> feature vector, via mapInPandas (Arrow batches).

    The real decode (PIL/cv2) is not available in this container; with
    fake=False this raises NotImplementedError at executor time, with
    fake=True a deterministic content-seeded decode keeps the plumbing
    testable: schema, batch iteration, and the feature reduction are all
    the real code path. The reduction (channel means + quadrant means) is
    BATCHED numpy: rows are grouped by image shape and each group is
    decoded and reduced as one (m, H, W, 3) stack — a real codec would
    force per-item decode, but nothing downstream of the pixels should
    (or does) loop per row.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            if not fake:
                raise NotImplementedError(
                    "image decode requires PIL/cv2 (not in sandbox); "
                    "pass fake=True for the deterministic stub"
                )
            m = len(pdf)
            seeds = _payload_seeds(pdf["payload"], m)
            widths = np.asarray(
                [int(meta["width"] or 16) for meta in pdf["meta"]], dtype=np.int64
            )
            heights = np.asarray(
                [int(meta["height"] or 16) for meta in pdf["meta"]], dtype=np.int64
            )
            # n_features caps at the 7 available stub features
            n_out = min(n_features, _N_STUB_FEATURES)
            feats = np.empty((m, n_out), dtype=np.float64)
            # group by shape -> vectorized decode+reduce per group, with a
            # pixel budget bounding the decoded stack (a 10k-row Arrow
            # batch of 512x512 images would otherwise materialize ~60 GB
            # of uint64 counters at once)
            pixel_budget = 32_000_000  # elements per decoded stack
            shape_key = widths << 32 | heights
            for key in np.unique(shape_key):
                all_rows = np.flatnonzero(shape_key == key)
                w, h = int(widths[all_rows[0]]), int(heights[all_rows[0]])
                per_img = max(h * w * 3, 1)
                step = max(pixel_budget // per_img, 1)
                for off in range(0, len(all_rows), step):
                    rows = all_rows[off : off + step]
                    imgs = _fake_decode_batch(seeds[rows], w, h)
                    feats[rows] = _channel_quadrant_features(imgs, h, w)[:, :n_out]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "features": list(feats),
                }
            )

    return media.mapInPandas(op, "media_id string, features array<double>")


def frame_sample_plan(
    media: DataFrame, every_ms: int = 1000
) -> DataFrame:
    """Video -> (media_id, frame_idx, frame_ts_ms) sampling plan, fully
    relational (sequence/explode); the frame EXTRACTION would be another
    mapInPandas decode over this plan joined back to payloads."""
    n = (F.col("meta.duration_ms") / F.lit(every_ms)).cast("int")
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)))
            ).alias("frame_idx"),
        )
        .withColumn("frame_ts_ms", F.col("frame_idx") * F.lit(every_ms))
    )


def extract_frame_features(
    media: DataFrame,
    every_ms: int = 1000,
    n_features: int = 8,
    target: tuple[int, int] = (8, 8),
    fake: bool = False,
) -> DataFrame:
    """Video pipeline tail: frame_sample_plan JOIN payloads -> per-frame
    decode + resize + feature-extract, one mapInPandas stage.

    The sampling PLAN is relational (frame_sample_plan); this operator
    joins it back to the payload column (equi-join on media_id — the
    plan side is narrow, so AQE broadcasts it at small scale and
    co-partitions at large) and runs the decode per (payload, frame_idx)
    batch-vectorized: the stub seeds a counter-based hash with
    (content seed, frame_idx) and decodes straight AT the target
    resolution — modeling the fused decode+resize every real video
    reader does (never materialize full frames only to shrink them).
    A real codec (PyAV/ffmpeg) would replace _fake_decode_batch; the
    join/partition/batch plumbing is the production path.

    Returns (media_id, frame_idx, features array<double>).
    """
    th, tw = target
    plan = frame_sample_plan(media, every_ms)
    joined = plan.join(
        media.select("media_id", "payload"), "media_id"
    ).select("media_id", "frame_idx", "payload")

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            if not fake:
                raise NotImplementedError(
                    "video decode requires PyAV/ffmpeg (not in sandbox); "
                    "pass fake=True for the deterministic stub"
                )
            m = len(pdf)
            seeds = _payload_seeds(pdf["payload"], m)
            fidx = pdf["frame_idx"].to_numpy(dtype=np.int64)
            frame_seeds = PX.np_frame_seeds(seeds, fidx)
            # n_features caps at the 7 available stub features
            n_out = min(n_features, _N_STUB_FEATURES)
            feats = np.empty((m, n_out), dtype=np.float64)
            pixel_budget = 32_000_000
            step = max(pixel_budget // max(th * tw * 3, 1), 1)
            for off in range(0, m, step):
                rows = slice(off, min(off + step, m))
                imgs = _fake_decode_batch(frame_seeds[rows], tw, th)
                feats[rows] = _channel_quadrant_features(imgs, th, tw)[:, :n_out]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_idx": pdf["frame_idx"],
                    "features": list(feats),
                }
            )

    return joined.mapInPandas(
        op, "media_id string, frame_idx long, features array<double>"
    )
