"""Multimodal column plumbing (engine extension, round brief).

Images/audio/video are opaque BinaryType columns with typed metadata. The
Spark-side machinery — schema, partition-friendly batch shape, Arrow UDF
signatures — is real and tested; the actual media decoding is STUBBED
(this container has no image/audio libraries): `decode_image` raises
NotImplementedError unless `fake=True`, in which case a deterministic fake
decoder (sha-seeded dimensions, mean "pixel" from byte stats) exercises the
full pipeline.

Production swap-in: replace `_decode_one` with PIL/libvips/ffmpeg calls —
the mapInPandas batch shape (bytes in, struct rows out) is unchanged.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id string, media_type string, n_bytes long, sha256 string, "
    "width int, height int, n_frames int, mean_intensity double"
)


def attach_binary_payload(df: DataFrame, payload_col: str, media_type: str) -> DataFrame:
    """Mark a binary column as a typed media payload (adds media metadata
    columns computed JVM-side: size + sha256)."""
    return df.withColumn("media_type", F.lit(media_type)).withColumn(
        "n_bytes", F.length(F.col(payload_col))
    ).withColumn("sha256", F.sha2(F.col(payload_col), 256))


def _decode_one(payload: bytes, media_type: str, fake: bool) -> tuple:
    if not fake:
        raise NotImplementedError(
            "media decoding requires image/audio libs not present in this "
            "container; pass fake=True for the deterministic test decoder"
        )
    digest = hashlib.sha256(payload).digest()
    width = 64 + digest[0] % 192
    height = 64 + digest[1] % 192
    n_frames = 1 if media_type == "image" else 1 + digest[2] % 120
    arr = np.frombuffer(payload[:4096], dtype=np.uint8)
    mean_intensity = float(arr.mean()) if len(arr) else 0.0
    return width, height, n_frames, mean_intensity


def extract_media_features(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    media_type: str = "image",
    fake: bool = False,
) -> DataFrame:
    """Decode/feature-extract media payloads via mapInPandas (Arrow batches
    of raw bytes; one output row per media item)."""

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                data = bytes(payload)
                w, h, nf, mi = _decode_one(data, media_type, fake)
                rows.append(
                    (
                        str(mid),
                        media_type,
                        len(data),
                        hashlib.sha256(data).hexdigest(),
                        w,
                        h,
                        nf,
                        mi,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "media_type", "n_bytes", "sha256",
                    "width", "height", "n_frames", "mean_intensity",
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(_run, schema=MEDIA_SCHEMA)


def frame_sample_plan(
    df: DataFrame, every_n: int = 10, id_col: str = "media_id"
) -> DataFrame:
    """Frame-sampling plumbing for video payloads: emits (media_id,
    frame_no) rows for every_n-th frame of the decoded frame count —
    sampling plan only; actual frame extraction is behind the same stub."""
    return df.select(
        id_col,
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_no"),
    )
