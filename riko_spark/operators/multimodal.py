"""Multimodal columns: image/audio/video as opaque binary + metadata.

The decode/feature kernels need codec libraries absent from this
container, so the *kernels* are stubbed deterministically, while the
Spark-side plumbing — schema, Arrow batch shape, ``mapInPandas``
signatures, partition sizing — is real and tested.  Swapping the stub
for PIL/torchaudio/ffmpeg is a one-function change per modality.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from riko_spark.operators import register

MEDIA_META_SCHEMA = (
    "id bigint, n_bytes bigint, media_type string, magic string"
)

IMAGE_FEATURES_SCHEMA = (
    "id bigint, width int, height int, feature array<float>"
)

FRAME_SAMPLE_SCHEMA = "id bigint, frame_idx int, frame bytes".replace("bytes", "binary")

_MAGIC = {
    b"\x89PNG": "image/png",
    b"\xff\xd8\xff": "image/jpeg",
    b"RIFF": "audio/wav",
    b"\x00\x00\x00": "video/mp4",
}


def sniff_media_type(b: bytes | None) -> str:
    if not b:
        return "unknown"
    for magic, mt in _MAGIC.items():
        if b.startswith(magic):
            return mt
    return "application/octet-stream"


def _decode_image_stub(b: bytes) -> tuple[int, int, np.ndarray]:
    """Deterministic fake decode: dimensions and a feature vector
    derived from the bytes.  Real impl: PIL.Image.open + resize +
    model forward — not available in this container."""
    h = hash_bytes = np.frombuffer(b[:64].ljust(64, b"\0"), dtype=np.uint8).astype(np.float32)
    width = int(64 + (len(b) % 512))
    height = int(64 + (hash_bytes.sum() % 512))
    feat = (hash_bytes / 255.0)[:16]
    return width, height, feat


@register("media_metadata")
def media_metadata_op(df: DataFrame, conf: dict | None = None,
                      field: str = "blob", id_col: str = "id") -> DataFrame:
    """Typed metadata over an opaque binary column — fully native
    (no decode needed): byte length + magic-number sniff."""
    blob = F.col(field)
    magic = F.hex(F.substring(blob, 1, 4))
    return df.select(
        F.col(id_col).alias("id"),
        F.octet_length(blob).cast("bigint").alias("n_bytes"),
        F.when(magic.startswith("89504E47"), "image/png")
        .when(magic.startswith("FFD8FF"), "image/jpeg")
        .when(magic.startswith("52494646"), "audio/wav")
        .otherwise("application/octet-stream")
        .alias("media_type"),
        magic.alias("magic"),
    )


@register("image_features")
def image_features_op(df: DataFrame, conf: dict | None = None,
                      field: str = "blob", id_col: str = "id") -> DataFrame:
    """Decode → resize → feature-extract over Arrow batches.

    ``mapInPandas`` so each task holds one Arrow batch of images — the
    right shape for batched GPU/CPU inference.  Decode kernel is the
    deterministic stub (container has no image libs)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, b in zip(pdf[id_col], pdf[field]):
                if b is None:
                    continue
                w, h, feat = _decode_image_stub(bytes(b))
                rows.append((rid, w, h, feat.tolist()))
            yield pd.DataFrame(rows, columns=["id", "width", "height", "feature"])

    return df.mapInPandas(run, IMAGE_FEATURES_SCHEMA)


@register("frame_sample")
def frame_sample_op(df: DataFrame, conf: dict | None = None,
                    field: str = "blob", id_col: str = "id",
                    every: int = 4, max_frames: int = 8) -> DataFrame:
    """Sample every Nth "frame" from a video blob (UDTF shape: one row
    in → many rows out).  Stub slices the blob; real impl: ffmpeg."""
    conf = conf or {}
    every = int(conf.get("every", every))
    max_frames = int(conf.get("max_frames", max_frames))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, b in zip(pdf[id_col], pdf[field]):
                if b is None:
                    continue
                b = bytes(b)
                chunk = max(1, len(b) // max(1, max_frames * every))
                for i, off in enumerate(range(0, len(b), chunk * every)):
                    if i >= max_frames:
                        break
                    rows.append((rid, i, b[off:off + chunk]))
            yield pd.DataFrame(rows, columns=["id", "frame_idx", "frame"])

    return df.mapInPandas(run, FRAME_SAMPLE_SCHEMA)


def audio_decode_stub(*_args, **_kwargs):
    """Placeholder for the audio decode kernel (torchaudio/soundfile
    not in this container)."""
    raise NotImplementedError(
        "audio decode requires an audio codec library; wire soundfile/"
        "torchaudio here — the mapInPandas plumbing is media_metadata/"
        "image_features-shaped"
    )
