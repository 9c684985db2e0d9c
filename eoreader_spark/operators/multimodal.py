"""Multimodal (image/audio/video) column plumbing for training pipelines.

Payloads are opaque `binary` columns with typed metadata; the Spark side —
schema, partitioning, Arrow batch shape, kernel signatures — is real and
tested.  The image path uses the engine's own codecs (real decode).  The
audio path REALLY decodes PCM WAV (stdlib ``wave`` — no external libs
needed); compressed audio (mp3/flac) and video decode need
libsndfile/ffmpeg, absent in this container, so those raise
NotImplementedError unless `fake=True`, in which case a clearly-marked
deterministic fake (closed-form synthesis from the payload hash) stands in
so the distributed plumbing is exercisable end-to-end.
"""

from __future__ import annotations

import hashlib
import io
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from eoreader_spark import codecs

MEDIA_SCHEMA = (
    "media_id string, kind string, bytes binary, fmt string,"
    " w int, h int, sample_rate int, n_frames int"
)


def _fake_signal(data: bytes, n: int) -> np.ndarray:
    """DETERMINISTIC FAKE decode: pseudo-signal derived from the payload
    digest — stands in for libsndfile/ffmpeg output."""
    seed = int.from_bytes(hashlib.sha256(data).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.standard_normal(n).astype(np.float32)


def image_features(media: DataFrame, resize: int = 8) -> DataFrame:
    """REAL path: decode image bytes, box-resize to (resize x resize), emit a
    flat feature vector per row.  mapInPandas, one decode per image."""
    schema = "media_id string, features array<float>"

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, data, fmt, w, h in zip(
                pdf["media_id"], pdf["bytes"], pdf["fmt"], pdf["w"], pdf["h"]
            ):
                img = codecs.decode(bytes(data), fmt, int(h), int(w)).astype(np.float32)
                p, hh, ww = img.shape
                bh, bw = hh // resize, ww // resize
                feat = (
                    img[:, : bh * resize, : bw * resize]
                    .reshape(p, resize, bh, resize, bw)
                    .mean(axis=(2, 4))
                )
                rows.append((mid, feat.ravel()))
            yield pd.DataFrame(rows, columns=["media_id", "features"])

    return media.filter("kind = 'image'").mapInPandas(batch, schema=schema)


def encode_wav(sig: np.ndarray, sample_rate: int) -> bytes:
    """float [-1,1] mono -> 16-bit PCM WAV bytes (stdlib, deterministic)."""
    pcm = np.clip(np.asarray(sig, dtype=np.float64), -1.0, 1.0)
    pcm16 = np.round(pcm * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(int(sample_rate))
        w.writeframes(pcm16.tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """PCM WAV bytes -> (float32 mono signal in [-1,1], sample_rate).
    REAL decode via the stdlib wave module (8/16-bit PCM; multi-channel
    averaged to mono)."""
    with wave.open(io.BytesIO(data)) as w:
        sr = w.getframerate()
        ch = w.getnchannels()
        sw = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if sw == 2:
        sig = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif sw == 1:
        sig = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"PCM sample width {sw} not supported")
    if ch > 1:
        sig = sig.reshape(-1, ch).mean(axis=1)
    return sig, sr


def audio_features(media: DataFrame, n_mels: int = 16, fake: bool = False) -> DataFrame:
    """Audio -> per-band RMS energy features.  PCM WAV payloads (RIFF magic)
    decode for REAL via the stdlib; compressed codecs need libsndfile/ffmpeg
    (absent) and raise unless fake=True substitutes the deterministic
    pseudo-signal."""
    schema = "media_id string, features array<float>"

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, data, sr in zip(pdf["media_id"], pdf["bytes"], pdf["sample_rate"]):
                data = bytes(data)
                if data[:4] == b"RIFF":
                    sig, _ = decode_wav(data)  # REAL decode
                elif fake:
                    sig = _fake_signal(data, int(sr))  # 1 second
                else:
                    raise NotImplementedError(
                        "non-WAV audio decode requires libsndfile/ffmpeg (not in "
                        "container); pass fake=True for the deterministic stand-in"
                    )
                frames = sig[: len(sig) // n_mels * n_mels].reshape(n_mels, -1)
                rows.append((mid, np.sqrt((frames**2).mean(axis=1)).astype(np.float32)))
            yield pd.DataFrame(rows, columns=["media_id", "features"])

    return media.filter("kind = 'audio'").mapInPandas(batch, schema=schema)


def audio_stats(media: DataFrame) -> DataFrame:
    """Integer sample statistics over REAL-decoded PCM WAV payloads.

    decode_wav's float32 signal is pcm16/32768 — exact for every int16 (the
    divisor is a power of two), so round(sig*32768) reconstructs the encoded
    samples bit-for-bit and the emitted sums are engine-independent integers:
    this is the value-exact gate surface for the multimodal audio path
    (sum of squares stays < 2^62 for any WAV under ~2^31 samples)."""
    schema = (
        "media_id string, n_samples long, s_sum long, s_min long, s_max long, ss_sum long"
    )

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, data in zip(pdf["media_id"], pdf["bytes"]):
                sig, _ = decode_wav(bytes(data))  # REAL decode
                k = np.round(sig.astype(np.float64) * 32768.0).astype(np.int64)
                rows.append(
                    (mid, len(k), int(k.sum()), int(k.min()), int(k.max()), int((k * k).sum()))
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "n_samples", "s_sum", "s_min", "s_max", "ss_sum"]
            )

    return media.filter("kind = 'audio'").mapInPandas(batch, schema=schema)


def video_frame_sample(media: DataFrame, every_n: int = 10, fake: bool = False) -> DataFrame:
    """STUB: video decode needs ffmpeg (absent).  Emits one row per sampled
    frame with a per-frame feature vector; with fake=True frames are
    deterministic pseudo-images."""
    schema = "media_id string, frame_idx int, features array<float>"

    def batch(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, data, nf in zip(pdf["media_id"], pdf["bytes"], pdf["n_frames"]):
                if not fake:
                    raise NotImplementedError(
                        "video decode requires ffmpeg (not in container); "
                        "pass fake=True for the deterministic stand-in"
                    )
                for fi in range(0, int(nf), every_n):
                    sig = _fake_signal(bytes(data) + fi.to_bytes(4, "big"), 16)
                    rows.append((mid, fi, sig))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "features"])

    return media.filter("kind = 'video'").mapInPandas(batch, schema=schema)
