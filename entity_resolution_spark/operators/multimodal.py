"""Multimodal columns: images/audio as opaque ``binary`` + typed metadata.

Training-data pipelines carry media as binary columns next to text.  The
Spark-side plumbing here is real and tested — schemas, Arrow-batched
``mapInPandas`` decode/feature/resize/frame-sample operators, partition-size
hygiene (never collect binaries, bound Arrow batch sizes) — while the actual
codec step is pluggable:

* a **deterministic synthetic codec** (``IMG1``/``AUD1``/``VID1`` headers,
  raw payload) used by tests and fixtures, and
* a clearly-marked hook that raises ``NotImplementedError`` for real formats
  (JPEG/PNG/WAV/MP4) — the image/audio libraries are not in this container;
  on a real cluster you plug Pillow/ffmpeg into ``decode_image_bytes`` etc.
  without touching any Spark code.
"""

from __future__ import annotations

import struct
from typing import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = "doc_id long, width int, height int, channels int, mean_luma double"
AUDIO_META_SCHEMA = "doc_id long, sample_rate int, n_samples int, duration_s double, rms double"
FRAME_SCHEMA = "doc_id long, frame_idx int, frame png binary".replace(" png", "")


# ---------------------------------------------------------------------------
# Synthetic codec (deterministic, dependency-free)
# ---------------------------------------------------------------------------

def encode_image(width: int, height: int, pixels: np.ndarray) -> bytes:
    """IMG1 | w | h | uint8 grayscale payload (row-major)."""
    return b"IMG1" + struct.pack("<II", width, height) + pixels.astype(np.uint8).tobytes()


def encode_audio(sample_rate: int, samples: np.ndarray) -> bytes:
    """AUD1 | sr | n | int16 PCM payload."""
    s = samples.astype(np.int16)
    return b"AUD1" + struct.pack("<II", sample_rate, len(s)) + s.tobytes()


def encode_video(width: int, height: int, frames: list[np.ndarray]) -> bytes:
    """VID1 | w | h | n_frames | concatenated grayscale frames."""
    head = b"VID1" + struct.pack("<III", width, height, len(frames))
    return head + b"".join(f.astype(np.uint8).tobytes() for f in frames)


def decode_image_bytes(data: bytes) -> tuple[int, int, np.ndarray]:
    if data[:4] == b"IMG1":
        w, h = struct.unpack("<II", data[4:12])
        px = np.frombuffer(data[12 : 12 + w * h], dtype=np.uint8).reshape(h, w)
        return w, h, px
    # REAL-CODEC HOOK: plug Pillow here (`PIL.Image.open(io.BytesIO(data))`).
    raise NotImplementedError("real image codecs (JPEG/PNG) not available in this container")


def decode_audio_bytes(data: bytes) -> tuple[int, np.ndarray]:
    if data[:4] == b"AUD1":
        sr, n = struct.unpack("<II", data[4:12])
        pcm = np.frombuffer(data[12 : 12 + 2 * n], dtype=np.int16)
        return sr, pcm
    # REAL-CODEC HOOK: plug soundfile/librosa here.
    raise NotImplementedError("real audio codecs (WAV/MP3) not available in this container")


def decode_video_bytes(data: bytes) -> tuple[int, int, list[np.ndarray]]:
    if data[:4] == b"VID1":
        w, h, n = struct.unpack("<III", data[4:16])
        frames = []
        off = 16
        for _ in range(n):
            frames.append(np.frombuffer(data[off : off + w * h], dtype=np.uint8).reshape(h, w))
            off += w * h
        return w, h, frames
    # REAL-CODEC HOOK: plug ffmpeg here.
    raise NotImplementedError("real video codecs not available in this container")


# ---------------------------------------------------------------------------
# Spark operators (mapInPandas — binary stays executor-side, Arrow-batched)
# ---------------------------------------------------------------------------

def image_features(df: DataFrame, id_col: str = "doc_id", bin_col: str = "image") -> DataFrame:
    """Decode + feature-extract per image: (id, width, height, channels, mean_luma)."""

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for rid, data in zip(pdf[id_col], pdf[bin_col]):
                w, h, px = decode_image_bytes(bytes(data))
                out.append((rid, w, h, 1, float(px.mean())))
            yield pd.DataFrame(
                out, columns=["doc_id", "width", "height", "channels", "mean_luma"]
            )

    return df.select(id_col, bin_col).mapInPandas(run, IMAGE_META_SCHEMA)


def image_resize(
    df: DataFrame, out_w: int, out_h: int, id_col: str = "doc_id", bin_col: str = "image"
) -> DataFrame:
    """Nearest-neighbor resize, re-encoded to the synthetic format."""

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for rid, data in zip(pdf[id_col], pdf[bin_col]):
                w, h, px = decode_image_bytes(bytes(data))
                yi = (np.arange(out_h) * h // out_h).clip(0, h - 1)
                xi = (np.arange(out_w) * w // out_w).clip(0, w - 1)
                small = px[np.ix_(yi, xi)]
                ids.append(rid)
                blobs.append(encode_image(out_w, out_h, small))
            yield pd.DataFrame({"doc_id": ids, "image": blobs})

    return df.select(id_col, bin_col).mapInPandas(run, f"doc_id long, {bin_col} binary")


def audio_features(df: DataFrame, id_col: str = "doc_id", bin_col: str = "audio") -> DataFrame:
    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for rid, data in zip(pdf[id_col], pdf[bin_col]):
                sr, pcm = decode_audio_bytes(bytes(data))
                rms = float(np.sqrt(np.mean(pcm.astype(np.float64) ** 2))) if len(pcm) else 0.0
                out.append((rid, sr, len(pcm), len(pcm) / sr if sr else 0.0, rms))
            yield pd.DataFrame(
                out, columns=["doc_id", "sample_rate", "n_samples", "duration_s", "rms"]
            )

    return df.select(id_col, bin_col).mapInPandas(run, AUDIO_META_SCHEMA)


def video_frame_sample(
    df: DataFrame, every_n: int = 2, id_col: str = "doc_id", bin_col: str = "video"
) -> DataFrame:
    """Sample every n-th frame → one row per (doc, frame), frame re-encoded."""

    def run(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, blobs = [], [], []
            for rid, data in zip(pdf[id_col], pdf[bin_col]):
                w, h, frames = decode_video_bytes(bytes(data))
                for i in range(0, len(frames), every_n):
                    ids.append(rid)
                    idxs.append(i)
                    blobs.append(encode_image(w, h, frames[i]))
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": blobs})

    return df.select(id_col, bin_col).mapInPandas(
        run, "doc_id long, frame_idx int, frame binary"
    )
