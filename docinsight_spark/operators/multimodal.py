"""Multimodal column plumbing: image/audio/video as opaque binary.

Media are carried as ``binary`` payloads plus typed metadata; decode /
feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` kernels.  The actual codec step is STUBBED — the
image/audio libraries are not in this container — behind
``decoder="fake"`` (deterministic, seeded from the payload bytes) or
``decoder="real"`` (raises ``NotImplementedError`` at the import-try
boundary).  The Spark-side plumbing — schema, partitioning, UDF
signatures, batch shapes — is real and tested.

Reference analog: binary BLOBs in the chunk store
(``/root/reference/db/schema.sql:29-41`` keeps pickled embeddings as
BLOB); here the same column class carries media payloads.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, modality string, payload binary, "
    "width int, height int, sample_rate int, n_frames int"
)

FEATURE_SCHEMA = (
    "media_id long, modality string, feat array<float>, "
    "decoded_width int, decoded_height int"
)


def make_media_table(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media rows (payload = seeded bytes)."""
    rows = []
    for i in range(n):
        mod = ["image", "audio", "video"][i % 3]
        payload = hashlib.sha256(f"{seed}:{i}".encode()).digest() * (4 + i % 7)
        rows.append(
            (
                i,
                mod,
                bytearray(payload),
                64 + (i % 8) * 16 if mod != "audio" else None,
                48 + (i % 8) * 16 if mod != "audio" else None,
                16000 if mod == "audio" else None,
                25 * (1 + i % 4) if mod == "video" else None,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _fake_decode(payload: bytes, out_dim: int = 16) -> np.ndarray:
    """Deterministic stand-in for a real codec: byte-histogram features.

    Replace with PIL/librosa/ffmpeg when available — same signature:
    bytes in, float feature vector out, one call per Arrow batch row
    but all arithmetic vectorized over the batch."""
    arr = np.frombuffer(bytes(payload), dtype=np.uint8)
    hist = np.bincount(arr % out_dim, minlength=out_dim).astype(np.float32)
    return hist / max(len(arr), 1)


def extract_features(
    media: DataFrame, decoder: str = "fake", out_dim: int = 16
) -> DataFrame:
    """mapInPandas feature extraction over binary payloads.

    Partitioning note: payloads dominate row size, so the operator
    repartitions by ``media_id`` for even byte distribution before the
    kernel; on a real corpus use the file-size-aware reader
    (``spark.read.format('binaryFile')``) which splits by size."""
    if decoder == "real":
        raise NotImplementedError(
            "real media codecs (PIL/librosa/ffmpeg) are not installed in "
            "this environment; use decoder='fake' for the deterministic stub"
        )
    if decoder != "fake":
        raise ValueError(f"unknown decoder {decoder!r}")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _fake_decode(p, out_dim).tolist() if p is not None else None
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "feat": feats,
                    "decoded_width": pdf["width"],
                    "decoded_height": pdf["height"],
                }
            )

    return media.repartition("media_id").mapInPandas(kernel, schema=FEATURE_SCHEMA)


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Stub resize: metadata transform is real; pixel work is the stub
    (payload passed through, target dims recorded)."""
    return media.filter(F.col("modality") == "image").withColumn(
        "width", F.lit(width)
    ).withColumn("height", F.lit(height))


def sample_frames(media: DataFrame, every_n: int = 5) -> DataFrame:
    """Frame sampling plan for video rows: one output row per sampled
    frame index (posexplode of the frame grid) — the shuffle/explode
    shape of real frame extraction, with the decode stubbed."""
    vids = media.filter(F.col("modality") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
        "payload",
    )
