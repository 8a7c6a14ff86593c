"""Multimodal column plumbing (driver brief): image/audio/video as opaque
``binary`` columns + typed metadata, with decode / feature-extract / resize /
frame-sample as Arrow-batched ``mapInPandas`` operators.

The image/audio codec libraries are NOT in this container, so the codec
step is stubbed two ways (clearly marked):
  - ``strict=True``  → NotImplementedError at evaluation time (prod seam)
  - ``strict=False`` → a deterministic fake decoder (blake2b-derived
    features) so the Spark-side plumbing — schema, batch shape, UDF
    signature, partitioning — is real and TESTED end to end.

At scale: media bytes live in their own table keyed by content hash
(exactly like the crawl keeps ``html`` out of frontier shuffles); decode
fan-out is a mapInPandas over that table alone, with
``spark.sql.files.maxPartitionBytes`` sized so one partition of blobs fits
executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator
from hashlib import blake2b

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, width int, height int, "
    "duration_ms int, codec string"
)
FEATURE_DIM = 16


def _fake_decode(payload: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a real decoder: blake2b bytes → floats.
    STUB — replace with PIL/ffmpeg decode when codecs are available."""
    d = blake2b(payload, digest_size=dim).digest()
    return (np.frombuffer(d, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0


def extract_features(
    media: DataFrame, strict: bool = False, payload_col: str = "payload"
) -> DataFrame:
    """media(+payload binary) → + features array<float> via mapInPandas."""
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in media.schema.fields
    ) + ", features array<float>"

    def _op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError(
                    "media codecs not available in this container; "
                    "run with strict=False for the deterministic fake"
                )
            feats = [
                _fake_decode(bytes(p)).tolist() if p is not None else None
                for p in pdf[payload_col]
            ]
            yield pdf.assign(features=feats)

    return media.mapInPandas(_op, schema=out_schema)


def resize_images(
    media: DataFrame, target_w: int, target_h: int, strict: bool = False
) -> DataFrame:
    """Resize stub: passes payload through, rewrites width/height metadata.
    Real implementation = PIL resize inside the same mapInPandas shape."""
    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in media.schema.fields
    )

    def _op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError("image codecs not in container")
            pdf = pdf.assign(width=target_w, height=target_h)
            yield pdf

    return media.filter(F.col("kind") == "image").mapInPandas(
        _op, schema=out_schema
    )


def sample_frames(
    media: DataFrame, every_ms: int, strict: bool = False
) -> DataFrame:
    """Video frame sampling stub: one row per sampled timestamp with a
    deterministic fake frame digest (real impl: ffmpeg seek+decode)."""
    out_schema = "media_id long, frame_ts_ms int, frame_digest string"

    def _op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if strict:
                raise NotImplementedError("video codecs not in container")
            rows = {"media_id": [], "frame_ts_ms": [], "frame_digest": []}
            for mid, dur, payload in zip(
                pdf["media_id"], pdf["duration_ms"], pdf["payload"]
            ):
                if dur is None or payload is None:
                    continue
                for ts in range(0, int(dur), every_ms):
                    rows["media_id"].append(mid)
                    rows["frame_ts_ms"].append(ts)
                    rows["frame_digest"].append(
                        blake2b(
                            bytes(payload) + ts.to_bytes(8, "little"),
                            digest_size=8,
                        ).hexdigest()
                    )
            yield pd.DataFrame(rows)

    return media.filter(F.col("kind") == "video").mapInPandas(
        _op, schema=out_schema
    )


def make_synthetic_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic opaque-binary media fixture for plumbing tests."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=64, dtype=np.uint8).tobytes()
        rows.append(
            (
                i,
                kind,
                payload,
                224 if kind == "image" else None,
                224 if kind == "image" else None,
                3000 if kind == "video" else (1500 if kind == "audio" else None),
                {"image": "png", "audio": "wav", "video": "mp4"}[kind],
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
