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
from hashlib import blake2b, md5

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
    """Deterministic stand-in for a real decoder: md5-chain bytes → floats.
    STUB — replace with PIL/ffmpeg decode when codecs are available.

    feature[j] = (md5(hex(payload) + ':' + j)[:15 hex] % 256 - 128) / 128 —
    every value is a multiple of 1/128 (exact in float32 AND float64), and
    the whole chain is reproducible in the DuckDB oracle via
    ('0x'||substr(md5(...),1,15))::BIGINT, so the driver's q37 check can
    verify actual feature values, not just the plumbing shape.
    """
    hx = bytes(payload).hex()
    vals = [
        (int(md5(f"{hx}:{j}".encode()).hexdigest()[:15], 16) % 256 - 128)
        / 128.0
        for j in range(dim)
    ]
    return np.asarray(vals, dtype=np.float32)


def extract_features(
    media: DataFrame, strict: bool = False, payload_col: str = "payload"
) -> DataFrame:
    """media(+payload binary) → + features array<float> via mapInPandas.

    CODEC DROP-IN (when PIL/torchvision are installed): replace the
    ``_fake_decode(bytes(p))`` call below with exactly

        img = PIL.Image.open(io.BytesIO(p)).convert("RGB")
        feats = model(preprocess(img))          # np.ndarray, shape (dim,)

    keeping everything else — the mapInPandas signature, the Arrow batch
    iteration, the None-payload → None-features rule, and the
    ``array<float>`` output schema — byte-for-byte as is. The operator's
    Spark plan (partitioning, batch shape, schema) is what the tests pin;
    only the per-payload function changes.
    """
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

    CODEC DROP-IN: inside the batch loop, per row,

        img = PIL.Image.open(io.BytesIO(payload))
        out = io.BytesIO(); img.resize((target_w, target_h)).save(out, fmt)
        payload = out.getvalue()

    assigning the re-encoded payload alongside the width/height rewrite —
    the filter(kind='image'), schema and batch shape stay unchanged."""
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
    deterministic fake frame digest.

    CODEC DROP-IN: replace the digest computation with

        container = av.open(io.BytesIO(payload))        # PyAV/ffmpeg
        container.seek(ts * 1000, backward=True)
        frame = next(container.decode(video=0)).to_ndarray()

    emitting frame bytes (or a real digest of them) per sampled ts — the
    one-row-in/N-rows-out UDTF shape and output schema stay unchanged."""
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
    """Deterministic opaque-binary media fixture for plumbing tests.
    payload = md5(f"{seed}:{i}:payload") bytes — hex-reproducible in SQL so
    the q37 oracle can resynthesize the exact payloads from ``range(n)``."""
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = bytes.fromhex(md5(f"{seed}:{i}:payload".encode()).hexdigest())
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
