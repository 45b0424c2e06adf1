"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode kernels themselves are STUBBED (no image/audio libraries in
this environment — clearly marked below); everything Spark-side is
real and tested: schemas, Arrow batch shapes, ``mapInPandas``
signatures, partition sizing, frame-sampling arithmetic.  Swapping the
deterministic fake decoder for Pillow/libav is a one-function change
on the executors.

Schema convention:

    media(media_id long, kind string, content binary,
          meta map<string,string>)

kind ∈ {image, audio, video}; meta carries e.g. width/height/fps/
duration_s as strings (the open property-bag convention of the graph
store).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = "media_id long, kind string, content binary, meta map<string,string>"


def gen_media_table(spark: SparkSession, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic synthetic media rows (opaque bytes + metadata) for
    plumbing tests."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid in pdf["id"].tolist():
                kind = ["image", "audio", "video"][mid % 3]
                content = hashlib.sha256(f"{seed}:{mid}".encode()).digest() * (4 + mid % 7)
                meta = {
                    "image": {"width": str(32 + mid % 64), "height": str(32 + (mid * 3) % 64)},
                    "audio": {"sample_rate": "16000", "duration_s": str(1 + mid % 30)},
                    "video": {"fps": "24", "duration_s": str(1 + mid % 120)},
                }[kind]
                rows.append((mid, kind, content, meta))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "content", "meta"])

    return spark.range(0, n, 1, 4).mapInPandas(gen, schema=MEDIA_SCHEMA)


def _fake_decode(content: bytes, width: int, height: int) -> np.ndarray:
    """STUB — deterministic fake decoder (no Pillow in this env).
    Real implementation: ``PIL.Image.open(io.BytesIO(content))``.
    Produces a deterministic pseudo-image from the content hash so the
    downstream plumbing (shapes, batching, feature math) is test-real.
    """
    h = hashlib.sha256(content).digest()
    rng = np.random.default_rng(np.frombuffer(h[:8], dtype=np.uint64))
    return rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)


def decode_image_features(media: DataFrame, feat_dim: int = 16) -> DataFrame:
    """image rows → (media_id, width, height, features array<float>).

    Arrow-batched ``mapInPandas``: decode (stubbed), resize-pool to a
    4x4 grid mean per channel → 48-dim before projection to feat_dim.
    Real decode swaps in behind ``_fake_decode`` only.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                meta = row["meta"]
                w, h = int(meta["width"]), int(meta["height"])
                img = _fake_decode(bytes(row["content"]), w, h)
                # 4x4 mean-pool per channel → 48 dims, truncate/project
                ph, pw = max(h // 4, 1), max(w // 4, 1)
                pooled = (
                    img[: ph * 4, : pw * 4]
                    .reshape(4, ph, 4, pw, 3)
                    .mean(axis=(1, 3))
                    .reshape(-1)
                )
                feats = pooled[:feat_dim] / 255.0
                out.append((int(row["media_id"]), w, h, feats.astype(float).tolist()))
            yield pd.DataFrame(out, columns=["media_id", "width", "height", "features"])

    return (
        media.where(F.col("kind") == "image")
        .mapInPandas(run, schema="media_id long, width int, height int, features array<double>")
    )


def sample_video_frames(media: DataFrame, every_s: float = 1.0) -> DataFrame:
    """video rows → one row per sampled frame (media_id, frame_idx,
    t_offset_s).  Pure JVM arithmetic over metadata; the frame *decode*
    would be a second mapInPandas exactly like decode_image_features.
    """
    v = media.where(F.col("kind") == "video").select(
        "media_id",
        F.element_at("meta", "fps").cast("double").alias("fps"),
        F.element_at("meta", "duration_s").cast("double").alias("dur"),
    )
    n_frames = F.floor(F.col("dur") / F.lit(every_s)).cast("int")
    return v.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))).alias("sample_i"),
        "fps",
    ).select(
        "media_id",
        (F.col("sample_i") * F.lit(every_s) * F.col("fps")).cast("long").alias("frame_idx"),
        (F.col("sample_i") * F.lit(every_s)).alias("t_offset_s"),
    )


def audio_chunk_plan(media: DataFrame, chunk_s: float = 5.0) -> DataFrame:
    """audio rows → chunk boundaries (media_id, chunk_idx, start_s,
    end_s, n_samples) for downstream feature extraction."""
    a = media.where(F.col("kind") == "audio").select(
        "media_id",
        F.element_at("meta", "sample_rate").cast("long").alias("sr"),
        F.element_at("meta", "duration_s").cast("double").alias("dur"),
    )
    n_chunks = F.ceil(F.col("dur") / F.lit(chunk_s)).cast("int")
    return a.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.greatest(n_chunks - 1, F.lit(0)))).alias("chunk_idx"),
        "sr",
        "dur",
    ).select(
        "media_id",
        "chunk_idx",
        (F.col("chunk_idx") * F.lit(chunk_s)).alias("start_s"),
        F.least(F.col("chunk_idx") * F.lit(chunk_s) + F.lit(chunk_s), F.col("dur")).alias("end_s"),
        (
            (
                F.least(F.col("chunk_idx") * F.lit(chunk_s) + F.lit(chunk_s), F.col("dur"))
                - F.col("chunk_idx") * F.lit(chunk_s)
            )
            * F.col("sr")
        ).cast("long").alias("n_samples"),
    )


def decode_audio_features(media: DataFrame) -> DataFrame:
    """STUB endpoint for audio feature extraction.  The Spark plumbing
    (batch iterator, schema) is real; the DSP kernel is not available in
    this environment."""
    raise NotImplementedError(
        "audio decode requires an audio library not present in this "
        "environment; plumbing mirrors decode_image_features"
    )
