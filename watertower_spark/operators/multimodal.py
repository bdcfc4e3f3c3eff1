"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The Spark-side plumbing (schemas, batch shapes, partition-size-aware UDF
signatures) is real and tested; the actual decode steps are STUBBED
behind deterministic fakes because no image/audio codecs ship in this
container — each stub is clearly marked and structured so a real
implementation (PIL / torchaudio / pyav) drops into the same function
body without touching the dataflow.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms int"
)

IMAGE_FEATURE_SCHEMA = "media_id long, feat array<float>, ok boolean, err string"
FRAME_SAMPLE_SCHEMA = "media_id long, frame_idx int, frame binary"


def synthesize_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media rows (binary payload + typed metadata)."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=int(rng.integers(64, 512)), dtype=np.uint8).tobytes()
        rows.append(
            (
                i, kind, payload,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                int(rng.integers(16, 256)) if kind != "audio" else 0,
                int(rng.integers(16, 256)) if kind != "audio" else 0,
                int(rng.integers(1000, 60000)) if kind != "image" else 0,
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _decode_image_stub(payload: bytes, width: int, height: int) -> np.ndarray:
    """STUB — deterministic fake decode.

    Real implementation: ``PIL.Image.open(io.BytesIO(payload))`` →
    ``np.asarray(img.resize(...))``.  Not available in this container,
    so we derive a deterministic pseudo-pixel array from the payload
    bytes; shape and dtype match what a real decoder would produce.
    """
    h = np.frombuffer(payload, dtype=np.uint8)
    side = 8
    reps = int(np.ceil(side * side * 3 / h.size))
    return np.tile(h, reps)[: side * side * 3].reshape(side, side, 3)


def extract_image_features(media: DataFrame, feat_dim: int = 16) -> DataFrame:
    """Decode → feature-extract images via mapInPandas (Arrow batches).

    Batch shape contract: one output row per input image row; failures
    become (ok=false, err) rows instead of task retries — the correct
    posture for dirty CC-scale media payloads.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "feat": [], "ok": [], "err": []}
            for mid, payload, w, h in zip(pdf["media_id"], pdf["payload"], pdf["width"], pdf["height"]):
                try:
                    px = _decode_image_stub(payload, w, h).astype(np.float64)
                    # channel-mean / downsampled histogram: cheap, deterministic
                    flat = px.reshape(-1)
                    bins = np.histogram(flat, bins=feat_dim, range=(0, 255))[0]
                    feat = (bins / max(flat.size, 1)).astype(np.float32)
                    out["media_id"].append(mid)
                    out["feat"].append(feat.tolist())
                    out["ok"].append(True)
                    out["err"].append("")
                except Exception as exc:  # dirty payloads must not kill tasks
                    out["media_id"].append(mid)
                    out["feat"].append([0.0] * feat_dim)
                    out["ok"].append(False)
                    out["err"].append(str(exc)[:200])
            yield pd.DataFrame(out)

    return media.where(F.col("kind") == "image").select(
        "media_id", "payload", "width", "height"
    ).mapInPandas(kernel, IMAGE_FEATURE_SCHEMA)


def sample_video_frames(media: DataFrame, every_ms: int = 5000) -> DataFrame:
    """Frame sampling: one row per sampled frame.

    STUB decode — real implementation seeks with pyav; the fan-out shape
    (row explosion bounded by duration/every_ms) is the real contract.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_id, out_idx, out_frame = [], [], []
            for mid, payload, dur in zip(pdf["media_id"], pdf["payload"], pdf["duration_ms"]):
                n_frames = max(1, int(dur) // every_ms)
                for fi in range(n_frames):
                    # STUB: deterministic slice of payload stands in for
                    # a decoded frame buffer
                    start = (fi * 31) % max(len(payload) - 16, 1)
                    out_id.append(mid)
                    out_idx.append(fi)
                    out_frame.append(bytes(payload[start:start + 16]))
            yield pd.DataFrame({"media_id": out_id, "frame_idx": out_idx, "frame": out_frame})

    return media.where(F.col("kind") == "video").select(
        "media_id", "payload", "duration_ms"
    ).mapInPandas(kernel, FRAME_SAMPLE_SCHEMA)
