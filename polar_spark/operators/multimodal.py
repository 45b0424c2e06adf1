"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The IMAGE decode kernel is STUBBED (no Pillow/libjpeg in this
environment — clearly marked below); the AUDIO path is REAL: canonical
PCM WAV (RIFF) encode/decode and frame-level DSP features (RMS,
zero-crossing rate, spectral centroid, band energies) are pure
numpy — no external library needed.  Everything Spark-side is real and
tested for all modalities: schemas, Arrow batch shapes, ``mapInPandas``
signatures, partition sizing, frame-sampling arithmetic.  Swapping the
deterministic fake image decoder for Pillow is a one-function change
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
import struct
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
                if kind == "audio":
                    # REAL canonical PCM16 WAV: seeded tone + noise
                    sr, dur = 8000, 1 + mid % 3
                    rng = np.random.default_rng([seed, mid])
                    t = np.arange(sr * dur) / sr
                    f0 = 200.0 + (mid % 10) * 100.0
                    wave = 0.5 * np.sin(2 * np.pi * f0 * t) + 0.05 * rng.standard_normal(len(t))
                    content = encode_wav_pcm16(wave, sr)
                    meta = {"sample_rate": str(sr), "duration_s": str(dur)}
                else:
                    content = hashlib.sha256(f"{seed}:{mid}".encode()).digest() * (4 + mid % 7)
                    meta = {
                        "image": {"width": str(32 + mid % 64), "height": str(32 + (mid * 3) % 64)},
                        "video": {"fps": "24", "duration_s": str(1 + mid % 120)},
                    }[kind]
                rows.append((mid, kind, content, meta))
            yield pd.DataFrame(rows, columns=["media_id", "kind", "content", "meta"])

    return spark.range(0, n, 1, 4).mapInPandas(gen, schema=MEDIA_SCHEMA)


try:  # real decode when Pillow is available on the executors
    from PIL import Image as _PIL_Image  # pragma: no cover - absent in this env
except ImportError:  # env has no Pillow/libjpeg: deterministic fake below
    _PIL_Image = None


def _fake_decode(content: bytes, width: int, height: int) -> np.ndarray:
    """STUB fallback — deterministic pseudo-image from the content hash
    (no Pillow in this env), so the downstream plumbing (shapes,
    batching, feature math) is test-real."""
    h = hashlib.sha256(content).digest()
    rng = np.random.default_rng(np.frombuffer(h[:8], dtype=np.uint64))
    return rng.integers(0, 256, size=(height, width, 3), dtype=np.uint8)


def _decode(content: bytes, width: int, height: int) -> np.ndarray:
    """Decode to an RGB (h, w, 3) uint8 array: Pillow when importable,
    else the deterministic fake (loudly documented env limitation)."""
    if _PIL_Image is not None:  # pragma: no cover - absent in this env
        import io

        img = _PIL_Image.open(io.BytesIO(content)).convert("RGB")
        return np.asarray(img, dtype=np.uint8)
    return _fake_decode(content, width, height)


def decode_image_features(media: DataFrame, feat_dim: int = 16) -> DataFrame:
    """image rows → (media_id, width, height, features array<float>).

    ONE Arrow-batched ``mapInPandas`` stage.  Decode is per-image
    (inherently so: variable-size compressed payloads), but the pooling
    math is vectorized across the whole batch: images are grouped by
    (height, width), each group stacked into a single (n, h, w, 3)
    array, and the 4x4 grid mean-pool runs as one reshape+mean per
    group — no per-row Python in the feature math."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            metas = pdf["meta"]
            ws = np.array([int(m["width"]) for m in metas])
            hs = np.array([int(m["height"]) for m in metas])
            ids = pdf["media_id"].to_numpy()
            contents = pdf["content"].tolist()
            feats: list[list[float] | None] = [None] * len(pdf)
            for h, w in {(int(h), int(w)) for h, w in zip(hs, ws)}:
                idx = np.nonzero((hs == h) & (ws == w))[0]
                stack = np.stack([_decode(bytes(contents[i]), w, h) for i in idx])
                ph, pw = max(h // 4, 1), max(w // 4, 1)
                pooled = (
                    stack[:, : ph * 4, : pw * 4]
                    .reshape(len(idx), 4, ph, 4, pw, 3)
                    .mean(axis=(2, 4))
                    .reshape(len(idx), -1)
                )
                grp = pooled[:, :feat_dim] / 255.0
                for j, i in enumerate(idx):
                    feats[i] = grp[j].astype(float).tolist()
            yield pd.DataFrame(
                {
                    "media_id": ids.astype("int64"),
                    "width": ws.astype("int32"),
                    "height": hs.astype("int32"),
                    "features": feats,
                }
            )

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


# ------------------------------------------------------------------ audio
# Canonical PCM WAV is a trivial RIFF container — encode/decode and the
# frame-level DSP below are pure numpy, no external audio library.


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int) -> bytes:
    """float samples in [-1, 1] → canonical mono PCM16 WAV bytes."""
    pcm = np.clip(np.asarray(samples, dtype=np.float64), -1.0, 1.0)
    data = (pcm * 32767.0).astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16,
        b"data", len(data),
    )
    return hdr + data


def decode_wav_pcm16(content: bytes) -> tuple[int, np.ndarray]:
    """Canonical mono PCM16 WAV bytes → (sample_rate, float64 in [-1,1]).
    Walks RIFF chunks (fmt may be followed by LIST etc. before data)."""
    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, sr, data = 12, None, None
    while pos + 8 <= len(content):
        cid, size = struct.unpack_from("<4sI", content, pos)
        body = content[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt, channels, sr = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if (fmt, channels, bits) != (1, 1, 16):
                raise ValueError(f"only mono PCM16 supported, got {(fmt, channels, bits)}")
        elif cid == b"data":
            data = np.frombuffer(body, dtype="<i2").astype(np.float64) / 32767.0
        pos += 8 + size + (size & 1)  # RIFF chunks pad to even
    if sr is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return sr, data


def decode_audio_features(
    media: DataFrame, frame_s: float = 0.025, n_bands: int = 8
) -> DataFrame:
    """audio rows → (media_id, sample_rate, n_samples, rms, zcr,
    spectral_centroid_hz, band_energies array<double>).

    REAL DSP over Arrow batches: WAV decode (numpy), per-file RMS,
    zero-crossing rate (crossings/sec), spectral centroid via rfft, and
    ``n_bands`` linear band log-energies — the compact fingerprint a
    curation pipeline filters/clusters on.  Same mapInPandas shape as
    the image path; no external library.

    Vectorization (round 5, mirrors the image path): the RIFF header
    walk is per-file by nature (opaque variable-length blobs), but all
    FEATURE math pools — clips group by (sample_rate, n_samples), each
    group stacks into one (g, n) matrix, and RMS / ZCR / rfft / band
    energies run once per GROUP along axis 1 instead of once per row
    (batched FFT is where the time goes).  No ``iterrows``."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["media_id"].to_numpy(dtype=np.int64)
            decoded = [decode_wav_pcm16(bytes(b)) for b in pdf["content"]]
            groups: dict[tuple[int, int], list[int]] = {}
            for i, (sr, x) in enumerate(decoded):
                groups.setdefault((int(sr), len(x)), []).append(i)
            out = []
            for (sr, n), idxs in sorted(groups.items()):
                if n == 0:
                    out.extend(
                        (int(ids[i]), sr, 0, 0.0, 0.0, 0.0, [0.0] * n_bands)
                        for i in idxs
                    )
                    continue
                X = np.stack([decoded[i][1] for i in idxs])  # (g, n)
                rms = np.sqrt((X * X).mean(axis=1))
                zcr = (
                    np.abs(np.diff(np.signbit(X), axis=1)).sum(axis=1) * sr / n
                )
                power = np.abs(np.fft.rfft(X, axis=1)) ** 2  # (g, n//2+1)
                freqs = np.fft.rfftfreq(n, d=1.0 / sr)
                tot = power.sum(axis=1)
                with np.errstate(invalid="ignore", divide="ignore"):
                    centroid = np.where(
                        tot > 0, (power * freqs).sum(axis=1) / np.where(tot > 0, tot, 1.0), 0.0
                    )
                # same segment boundaries as np.array_split(power_row, n_bands)
                cuts = np.cumsum(
                    [0] + [len(s) for s in np.array_split(np.empty(power.shape[1]), n_bands)]
                )
                be = np.stack(
                    [
                        np.log1p(power[:, cuts[b] : cuts[b + 1]].sum(axis=1))
                        for b in range(n_bands)
                    ],
                    axis=1,
                )  # (g, n_bands)
                out.extend(
                    (
                        int(ids[i]), sr, n, float(rms[j]), float(zcr[j]),
                        float(centroid[j]), be[j].tolist(),
                    )
                    for j, i in enumerate(idxs)
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "sample_rate", "n_samples", "rms", "zcr",
                    "spectral_centroid_hz", "band_energies",
                ],
            )

    return media.where(F.col("kind") == "audio").mapInPandas(
        run,
        schema=(
            "media_id long, sample_rate int, n_samples long, rms double, "
            "zcr double, spectral_centroid_hz double, band_energies array<double>"
        ),
    )
