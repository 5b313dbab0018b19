"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads ride as ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample are Arrow-batched Pandas
stages over mapInPandas.

Decode (r2): REAL header parsers for the codec-less container formats —
BMP (BITMAPINFOHEADER), binary PPM/PGM (P6/P5), and RIFF/WAV (fmt + data
chunks).  These need zero codec libraries: width/height/channel/sample-rate/
duration come straight from the byte layout per the public format specs.
Formats beyond these (JPEG/PNG/MP4...) fall back to ``decode_stub``'s
deterministic byte-stats with media_type 'unknown' — swapping in PIL/ffmpeg
remains a one-function change.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media_type string, byte_len long, "
    "width int, height int, n_channels int, sample_rate int, "
    "duration_ms long, checksum string, feature_norm double"
)
_MEDIA_NULLS = {
    "width": None, "height": None, "n_channels": None,
    "sample_rate": None, "duration_ms": None,
}


def decode_stub(payload: bytes) -> dict:
    """Deterministic byte-stat fallback for formats without a header parser.
    Raises for a null payload so the unsupported case stays explicit."""
    if payload is None:
        raise NotImplementedError("real media decoding requires codec libs (PIL/ffmpeg)")
    import hashlib

    n = len(payload)
    mean = sum(payload) / n if n else 0.0
    return {
        "media_type": "unknown",
        "byte_len": n,
        **_MEDIA_NULLS,
        "checksum": hashlib.md5(payload).hexdigest(),
        "feature_norm": round(mean, 4),
    }


def _decode_bmp(payload: bytes) -> dict | None:
    """BMP: 14-byte file header + BITMAPINFOHEADER.  width int32le@18,
    height int32le@22 (negative = top-down -> abs), planes/bpp follow."""
    if len(payload) < 54 or payload[:2] != b"BM":
        return None
    width = struct.unpack_from("<i", payload, 18)[0]
    height = struct.unpack_from("<i", payload, 22)[0]
    return {
        "media_type": "image/bmp",
        **_MEDIA_NULLS,
        "width": abs(width),
        "height": abs(height),
    }


def _decode_ppm(payload: bytes) -> dict | None:
    """Binary PPM/PGM: 'P6'/'P5', then whitespace/comment-separated ASCII
    width height maxval."""
    if payload[:2] not in (b"P6", b"P5"):
        return None
    fields: list[int] = []
    i = 2
    n = len(payload)
    while i < n and len(fields) < 3:
        c = payload[i:i + 1]
        if c == b"#":  # comment to end of line
            while i < n and payload[i:i + 1] != b"\n":
                i += 1
        elif c.isspace():
            i += 1
        elif c.isdigit():
            j = i
            while j < n and payload[j:j + 1].isdigit():
                j += 1
            fields.append(int(payload[i:j]))
            i = j
        else:
            return None
    if len(fields) < 3:
        return None
    return {
        "media_type": "image/ppm" if payload[:2] == b"P6" else "image/pgm",
        **_MEDIA_NULLS,
        "width": fields[0],
        "height": fields[1],
    }


def _decode_wav(payload: bytes) -> dict | None:
    """RIFF/WAVE: iterate chunks; 'fmt ' gives channels uint16le@+2,
    sample_rate uint32le@+4, bits uint16le@+14; 'data' size gives duration
    (floor-ms over the byte rate)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    channels = rate = bits = data_size = None
    i = 12
    n = len(payload)
    while i + 8 <= n:
        cid = payload[i:i + 4]
        size = struct.unpack_from("<I", payload, i + 4)[0]
        if cid == b"fmt " and i + 8 + 16 <= n:
            channels = struct.unpack_from("<H", payload, i + 8 + 2)[0]
            rate = struct.unpack_from("<I", payload, i + 8 + 4)[0]
            bits = struct.unpack_from("<H", payload, i + 8 + 14)[0]
        elif cid == b"data":
            data_size = size
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if channels is None or data_size is None or not rate or not bits:
        return None
    byte_rate = rate * channels * (bits // 8)
    return {
        "media_type": "audio/wav",
        **_MEDIA_NULLS,
        "n_channels": channels,
        "sample_rate": rate,
        "duration_ms": data_size * 1000 // byte_rate if byte_rate else None,
    }


def decode_media(payload: bytes) -> dict:
    """Sniff the container magic and parse the real header; unknown formats
    fall back to decode_stub's byte stats.  Always fills the full MEDIA
    column set (checksum + feature_norm computed for every format)."""
    import hashlib

    if payload is None:
        raise NotImplementedError("real media decoding requires codec libs (PIL/ffmpeg)")
    parsed = _decode_bmp(payload) or _decode_ppm(payload) or _decode_wav(payload)
    if parsed is None:
        return decode_stub(payload)
    n = len(payload)
    parsed["byte_len"] = n
    parsed["checksum"] = hashlib.md5(payload).hexdigest()
    parsed["feature_norm"] = round(sum(payload) / n, 4) if n else 0.0
    return parsed


_MEDIA_COLUMNS = [
    "doc_id", "media_type", "byte_len", "width", "height",
    "n_channels", "sample_rate", "duration_ms", "checksum", "feature_norm",
]


def media_features(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """mapInPandas stage: (doc_id, payload binary) -> MEDIA_SCHEMA rows.
    Arrow batches bound memory; the loop is per-batch Python, not per-row UDF."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            recs = []
            for doc_id, payload in zip(pdf["doc_id"], pdf[payload_col]):
                feat = decode_media(bytes(payload) if payload is not None else b"")
                recs.append({"doc_id": doc_id, **feat})
            out = pd.DataFrame.from_records(recs, columns=_MEDIA_COLUMNS)
            # nullable ints must not decay to float through from_records
            for c in ("width", "height", "n_channels", "sample_rate", "duration_ms"):
                out[c] = out[c].astype("object")
            yield out

    return df.select("doc_id", payload_col).mapInPandas(fn, schema=MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# Deterministic payload synthesis (test/bench plumbing, not the operator):
# real BMP/WAV/PPM byte layouts whose header fields are pure functions of
# doc_id, so a SQL oracle can verify the DECODE output against the formulas
# without parsing bytes itself.
# ---------------------------------------------------------------------------

def make_bmp(width: int, height: int) -> bytes:
    row = ((width * 3 + 3) // 4) * 4  # rows padded to 4 bytes
    pixel_bytes = row * height
    header = b"BM" + struct.pack("<IHHI", 54 + pixel_bytes, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                       pixel_bytes, 2835, 2835, 0, 0)
    pixels = bytes((i * 7 + width) % 256 for i in range(pixel_bytes))
    return header + info + pixels


def make_wav(channels: int, rate: int, n_samples: int) -> bytes:
    data_size = n_samples * channels * 2  # 16-bit PCM
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2,
                      channels * 2, 16)
    data = bytes((i * 13 + channels) % 256 for i in range(data_size))
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt \
        + b"data" + struct.pack("<I", data_size) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def make_ppm(width: int, height: int) -> bytes:
    header = f"P6\n{width} {height}\n255\n".encode()
    return header + bytes((i * 11 + height) % 256 for i in range(3 * width * height))


def synthetic_media_payload(doc_id: int) -> bytes:
    """doc_id -> one of BMP / WAV / PPM with header fields that are simple
    arithmetic in doc_id (mirrored by the m_media_features SQL oracle)."""
    kind = doc_id % 3
    if kind == 0:
        return make_bmp(8 + doc_id % 32, 8 + (doc_id // 3) % 24)
    if kind == 1:
        return make_wav(1 + doc_id % 2, 8000 * (1 + doc_id % 3),
                        200 + doc_id % 100)
    return make_ppm(4 + doc_id % 16, 4 + (doc_id // 5) % 16)


def synthetic_media(df: DataFrame) -> DataFrame:
    """(doc_id, ...) -> (doc_id, payload binary) with deterministic real
    container bytes per doc_id (generator plumbing for tests/benchmarks)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "payload": [synthetic_media_payload(int(d)) for d in pdf["doc_id"]],
            })

    return df.select("doc_id").mapInPandas(fn, "doc_id long, payload binary")


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
