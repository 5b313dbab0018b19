"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads ride as ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample are Arrow-batched Pandas
stages over mapInPandas.  The image/audio codecs are NOT in this container, so
the decode kernel is stubbed: ``decode_stub`` raises NotImplementedError when
``strict`` and otherwise emits deterministic fake features (byte-level stats),
while the Spark-side contract — schema, batch shape, partitioning — is real
and tested.  Swapping the kernel for PIL/librosa is a one-function change.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media_type string, byte_len long, "
    "checksum string, width int, height int, feature_norm double"
)


def decode_stub(payload: bytes) -> dict:
    """Deterministic fake decoder: byte-level stats standing in for a real
    codec.  Raises for genuinely unsupported work so the stub is explicit."""
    if payload is None:
        raise NotImplementedError("real media decoding requires codec libs (PIL/ffmpeg)")
    import hashlib

    n = len(payload)
    # fake "dimensions": deterministic function of content
    h = hashlib.md5(payload).hexdigest()
    width = 16 + int(h[:4], 16) % 1024
    height = 16 + int(h[4:8], 16) % 1024
    mean = sum(payload) / n if n else 0.0
    return {
        "byte_len": n,
        "checksum": h,
        "width": width,
        "height": height,
        "feature_norm": round(mean, 4),
    }


def media_features(df: DataFrame, payload_col: str = "payload", media_type: str = "image") -> DataFrame:
    """mapInPandas stage: (doc_id, payload binary) -> MEDIA_SCHEMA rows.
    Arrow batches bound memory; the loop is per-batch Python, not per-row UDF."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                feat = decode_stub(bytes(payload) if payload is not None else b"")
                recs.append({"doc_id": doc_id, "media_type": media_type, **feat})
            yield pd.DataFrame.from_records(
                recs,
                columns=["doc_id", "media_type", "byte_len", "checksum",
                         "width", "height", "feature_norm"],
            )

    return df.select("doc_id", payload_col).mapInPandas(fn, schema=MEDIA_SCHEMA)


RESIZE_SCHEMA = (
    "doc_id long, width int, height int, payload binary"
)
FRAME_SCHEMA = (
    "doc_id long, frame_index int, frame_ts_ms long, payload binary"
)


def resize_stub(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic fake resize: a real implementation decodes with PIL and
    re-encodes; the stub derives a content-addressed payload of bounded size
    so batch shapes and memory behavior are realistic."""
    if payload is None:
        raise NotImplementedError("real image resize requires codec libs (PIL)")
    import hashlib

    seed = hashlib.md5(payload + f"{width}x{height}".encode()).digest()
    # repeat the digest to a size proportional to the target area (capped)
    size = min(width * height // 64 + 16, 4096)
    return (seed * (size // len(seed) + 1))[:size]


def resize_images(
    df: DataFrame, width: int = 64, height: int = 64, payload_col: str = "payload"
) -> DataFrame:
    """mapInPandas resize stage: (doc_id, payload) -> (doc_id, width, height,
    payload).  Arrow batches bound memory for multi-MB payloads."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                out = resize_stub(bytes(payload) if payload is not None else b"", width, height)
                recs.append({
                    "doc_id": doc_id, "width": width, "height": height,
                    "payload": out,
                })
            yield pd.DataFrame.from_records(
                recs, columns=["doc_id", "width", "height", "payload"]
            )

    return df.select("doc_id", payload_col).mapInPandas(fn, schema=RESIZE_SCHEMA)


def sample_frames(
    df: DataFrame, every_ms: int = 1000, max_frames: int = 8, payload_col: str = "payload"
) -> DataFrame:
    """mapInPandas frame-sampling stage for video-like payloads: one input row
    fans out to <= max_frames rows (doc_id, frame_index, frame_ts_ms, payload).
    The decode is stubbed (deterministic slices of the payload); the Spark-side
    contract — 1:N row fan-out inside an Arrow batch, bounded output size — is
    the real thing a video pipeline needs."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            recs = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                # fake "duration": 1 ms per byte
                n_frames = min(max(len(raw) // every_ms, 1), max_frames)
                for i in range(n_frames):
                    ts = i * every_ms
                    frame = hashlib.md5(raw + ts.to_bytes(8, "big")).digest()
                    recs.append({
                        "doc_id": doc_id, "frame_index": i,
                        "frame_ts_ms": ts, "payload": frame,
                    })
            yield pd.DataFrame.from_records(
                recs, columns=["doc_id", "frame_index", "frame_ts_ms", "payload"]
            )

    return df.select("doc_id", payload_col).mapInPandas(fn, schema=FRAME_SCHEMA)


def binary_stats(documents: DataFrame) -> DataFrame:
    """JVM-side byte stats over an encoded payload — the pushdown-friendly
    subset of media metadata that needs no Python at all.  Used as the
    oracle-checked face of the multimodal family."""
    payload = F.encode(F.col("text"), "utf-8")
    return documents.select(
        "doc_id",
        F.length(payload).alias("byte_len"),
        F.md5(payload).alias("checksum"),
    ).orderBy("doc_id")
