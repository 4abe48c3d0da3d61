"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata.

The decode step is STUBBED (image/audio libraries are not in this
container): ``decode_image`` raises ``NotImplementedError`` unless a
deterministic fake decoder is requested.  Everything around the stub —
schema, Arrow batch shape, ``mapInPandas`` plumbing, partition sizing —
is real and tested, so swapping in PIL/ffmpeg later touches one
function.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

MEDIA_SCHEMA = ("media_id long, kind string, payload binary, "
                "mime string, width int, height int, duration_ms int")

FEATURE_DIM = 16

_HAVE_PIL = False
try:  # pragma: no cover - not present in this container
    import PIL.Image  # noqa: F401
    _HAVE_PIL = True
except ImportError:
    pass


def decode_image(payload: bytes) -> "np.ndarray":
    """Real decoder — requires PIL (absent here)."""
    if not _HAVE_PIL:
        raise NotImplementedError(
            "image decoding requires PIL; use fake_decode for tests")
    raise NotImplementedError("wire PIL decode here")


def fake_decode(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic fake 'decode + feature extract': sha256 of the
    payload expanded to ``dim`` floats in [0,1).  Stands in for a real
    embedding model; deterministic per payload bytes."""
    h = hashlib.sha256(payload).digest()
    raw = np.frombuffer((h * ((dim * 4) // len(h) + 1))[:dim * 4],
                        dtype="<u4").astype("float64")
    return raw / 2**32


def synth_media(spark, n: int, kind: str = "image") -> DataFrame:
    """Deterministic synthetic media table (payload = seeded bytes)."""
    rng = spark.range(0, n, 1)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["id"].astype("int64")
            payloads = [hashlib.sha256(f"media-{i}".encode()).digest() * 8
                        for i in ids]
            yield pd.DataFrame({
                "media_id": ids,
                "kind": kind,
                "payload": payloads,
                "mime": "image/fake",
                "width": (ids % 640 + 32).astype("int32"),
                "height": (ids % 480 + 32).astype("int32"),
                "duration_ms": pd.array([None] * len(ids), dtype="Int32"),
            })

    return rng.mapInPandas(gen, schema=MEDIA_SCHEMA)


def extract_features(media: DataFrame, dim: int = FEATURE_DIM,
                     batch_limit: int = 1024) -> DataFrame:
    """media -> (media_id, features array<double>) via mapInPandas.

    The Arrow batch iterator shape is the real production plumbing:
    payload bytes never land in a Python list-of-rows, and each yielded
    batch is bounded so executor memory stays flat regardless of
    payload size."""
    src = media.select("media_id", "payload")

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_limit):
                chunk = pdf.iloc[lo:lo + batch_limit]
                arr = [fake_decode(bytes(p), dim) for p in chunk["payload"]]
                yield pd.DataFrame({
                    "media_id": chunk["media_id"].to_numpy(),
                    "features": [a.tolist() for a in arr],
                })

    return src.mapInPandas(
        feats, schema="media_id long, features array<double>")


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: (media_id, frame_ts_ms) rows derived
    from duration metadata — pure column expressions (the decode of each
    planned frame is the stubbed step)."""
    return (media.filter(F.col("duration_ms").isNotNull())
            .select("media_id",
                    F.explode(F.sequence(
                        F.lit(0), F.col("duration_ms"),
                        F.lit(every_ms))).alias("frame_ts_ms")))
