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

__all__ = [
    "MEDIA_SCHEMA",
    "with_content_hash",
    "decode_image_features",
    "frame_sample_plan",
]

MEDIA_SCHEMA = (
    "media_id string, kind string, payload binary, "
    "meta struct<width:int, height:int, mime:string, duration_ms:int>"
)


def with_content_hash(media: DataFrame) -> DataFrame:
    """Content address for dedupe-before-decode (sha2 over the payload)."""
    return media.withColumn("content_hash", F.sha2(F.col("payload"), 256))


def _fake_decode(payload: bytes, width: int, height: int) -> np.ndarray:
    """Deterministic stand-in decode: content-seeded pixels (H, W, 3)."""
    seed = int.from_bytes(payload[:8].ljust(8, b"\0"), "little") & 0x7FFFFFFF
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)


def decode_image_features(
    media: DataFrame, n_features: int = 8, fake: bool = False
) -> DataFrame:
    """payload binary -> feature vector, via mapInPandas (Arrow batches).

    The real decode (PIL/cv2) is not available in this container; with
    fake=False this raises NotImplementedError at executor time, with
    fake=True a deterministic content-seeded decode keeps the plumbing
    testable: schema, batch iteration, per-row ndarray handling, and the
    feature reduction are all the real code path.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for row in pdf.itertuples(index=False):
                if not fake:
                    raise NotImplementedError(
                        "image decode requires PIL/cv2 (not in sandbox); "
                        "pass fake=True for the deterministic stub"
                    )
                w = int(row.meta["width"] or 16)
                h = int(row.meta["height"] or 16)
                img = _fake_decode(bytes(row.payload), w, h)
                # channel-mean + quadrant-mean features, fixed length
                f0 = img.mean(axis=(0, 1)) / 255.0
                qs = [
                    img[: h // 2, : w // 2].mean(),
                    img[: h // 2, w // 2 :].mean(),
                    img[h // 2 :, : w // 2].mean(),
                    img[h // 2 :, w // 2 :].mean(),
                ]
                v = np.concatenate([f0, np.asarray(qs) / 255.0])
                feats.append(v[:n_features].astype(np.float64))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "features": [list(map(float, f)) for f in feats],
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
