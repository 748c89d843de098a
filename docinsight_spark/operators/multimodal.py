"""Multimodal column plumbing: image/audio/video as opaque binary.

Media are carried as ``binary`` payloads plus typed metadata; decode /
feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` kernels.  Decoder selection: ``decoder="fake"`` is a
deterministic stand-in (byte histogram, seeded from the payload);
``decoder="real"`` uses PIL/librosa when :func:`probe_codecs` finds
them (this container ships neither, so it raises); ``decoder="auto"``
probes and picks.  The Spark-side plumbing — schema, partitioning, UDF
signatures, batch shapes — is real and tested either way.

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


def probe_codecs() -> dict[str, bool]:
    """Which real media libraries exist in this interpreter.  The
    container ships none of them; on a production image the same probe
    flips decoders on with zero code change."""
    out = {}
    for name, mod in (("image", "PIL.Image"), ("audio", "librosa")):
        try:
            __import__(mod)
            out[name] = True
        except ImportError:
            out[name] = False
    return out


def _real_decode(payload: bytes, modality: str, out_dim: int = 16) -> np.ndarray:
    """Real decode path: PIL for images (pixel histogram features),
    librosa for audio (mel-band means).  Only reachable when
    :func:`probe_codecs` says the library exists."""
    import io

    if modality == "image":
        from PIL import Image

        img = Image.open(io.BytesIO(bytes(payload))).convert("L")
        px = np.asarray(img, dtype=np.uint8).ravel()
        hist = np.bincount(px // max(256 // out_dim, 1), minlength=out_dim)
        return (hist[:out_dim] / max(px.size, 1)).astype(np.float32)
    if modality == "audio":
        import librosa

        y, sr = librosa.load(io.BytesIO(bytes(payload)), sr=None, mono=True)
        mel = librosa.feature.melspectrogram(y=y, sr=sr, n_mels=out_dim)
        return mel.mean(axis=1).astype(np.float32)
    # video: no ffmpeg binding probed — fall back to byte features
    return _fake_decode(payload, out_dim)


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
    if decoder == "auto":
        # upgrade to real codecs when the image/audio libs exist;
        # otherwise stay on the deterministic stub — same plan shape
        decoder = "real" if any(probe_codecs().values()) else "fake"
    if decoder == "real":
        have = probe_codecs()
        if not any(have.values()):
            raise NotImplementedError(
                "real media codecs (PIL/librosa/ffmpeg) are not installed in "
                "this environment; use decoder='fake' for the deterministic "
                "stub or decoder='auto' to pick whichever is available"
            )
    elif decoder != "fake":
        raise ValueError(f"unknown decoder {decoder!r}")
    use_real = decoder == "real"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        have = probe_codecs() if use_real else {}
        for pdf in batches:
            feats = []
            for p, mod in zip(pdf["payload"], pdf["modality"]):
                if p is None:
                    feats.append(None)
                elif use_real and have.get(mod):
                    feats.append(_real_decode(p, mod, out_dim).tolist())
                else:
                    feats.append(_fake_decode(p, out_dim).tolist())
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
