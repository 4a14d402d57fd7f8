"""Multimodal column handling: opaque binary payloads + typed metadata.

Training-data pipelines carry image/audio/video alongside text as opaque
``binary`` columns with typed metadata structs. The Spark-side plumbing
here — schemas, Arrow-batched UDF signatures, partition-friendly batch
shapes — is real and tested; the actual media decoding is STUBBED behind
deterministic fakes (`NotImplementedError` for the real codec path),
because no image/audio libraries exist in this container. Swapping the
fake for PIL/ffmpeg changes only the inner function body.

Batch shape notes for 100 TB media:
- decode/feature UDFs run via ``mapInPandas`` so one Arrow batch holds
  many payloads but memory stays bounded by
  ``spark.sql.execution.arrow.maxRecordsPerBatch``;
- payload-bearing tables should be written with small row groups and
  read with ``spark.sql.files.maxPartitionBytes`` tuned down so one task
  never holds gigabytes of media.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType(), False),   # image/audio/video
        T.StructField("format", T.StringType(), True),        # jpeg/png/wav/...
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("sha256", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("media_sha256", T.StringType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), False),
    ]
)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def real_decode(payload: bytes, media_type: str) -> dict:
    """The real codec seam — stdlib-only where the container format
    allows it:

    - PNG: width/height live in the IHDR chunk (big-endian u32 pair at
      bytes 16-24, PNG spec §11.2.2) — one struct unpack.
    - JPEG: width/height live in the SOFn frame header (ITU T.81 §B.2.2:
      marker FFC0-FFCF except DHT/JPG/DAC, then length u16, precision u8,
      height u16, width u16) — a marker-segment walk, no entropy decode.
    - GIF: width/height are the logical-screen descriptor's little-endian
      u16 pair right after the GIF87a/GIF89a signature (GIF89a spec §18).
    - WAV: duration derives from the RIFF fmt chunk's byte rate and the
      data chunk's size (RIFF/WAVE spec) — a chunk walk.

    Actual pixel/sample decode (and every other container) needs
    PIL/soundfile/ffmpeg — wire them here; callers fall back to the
    deterministic fake on NotImplementedError."""
    import struct

    if (
        media_type == "image"
        and len(payload) >= 24
        and payload[:8] == _PNG_SIG
        and payload[12:16] == b"IHDR"
    ):
        width, height = struct.unpack(">II", payload[16:24])
        return {"format": "png", "width": int(width), "height": int(height)}
    if media_type == "image" and payload[:2] == b"\xff\xd8":
        dims = _jpeg_dims(payload)
        if dims is not None:
            return {"format": "jpeg", "width": dims[0], "height": dims[1]}
    if (
        media_type == "image"
        and len(payload) >= 10
        and payload[:6] in (b"GIF87a", b"GIF89a")
    ):
        width, height = struct.unpack("<HH", payload[6:10])
        return {"format": "gif", "width": int(width), "height": int(height)}
    if media_type == "audio" and payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        dur = _wav_duration_ms(payload)
        if dur is not None:
            return {"format": "wav", "duration_ms": dur}
    raise NotImplementedError(
        "media decoding beyond PNG/JPEG/GIF/WAV headers requires PIL/soundfile/ffmpeg; wire them here"
    )


# SOFn markers carry frame dimensions; C4 (DHT), C8 (JPG), CC (DAC) are
# not frame headers (ITU T.81 Table B.1)
_JPEG_NON_SOF = {0xC4, 0xC8, 0xCC}


def _jpeg_dims(payload: bytes) -> tuple[int, int] | None:
    """Walk JPEG marker segments from SOI to the first SOFn frame header
    and unpack (width, height). Returns None on a truncated/invalid
    stream (caller falls through to NotImplementedError)."""
    import struct

    i, n = 2, len(payload)
    while i + 4 <= n:
        if payload[i] != 0xFF:
            return None
        marker = payload[i + 1]
        if marker == 0xFF:  # fill bytes before a marker are legal
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:  # standalone
            i += 2
            continue
        if marker == 0xD9:  # EOI before any SOF
            return None
        seg_len = struct.unpack(">H", payload[i + 2 : i + 4])[0]
        if seg_len < 2 or i + 2 + seg_len > n:
            return None
        if 0xC0 <= marker <= 0xCF and marker not in _JPEG_NON_SOF:
            if seg_len < 7:
                return None
            height, width = struct.unpack(">HH", payload[i + 5 : i + 9])
            return int(width), int(height)
        if marker == 0xDA:  # entropy-coded data starts; SOF must precede it
            return None
        i += 2 + seg_len
    return None


def _wav_duration_ms(payload: bytes) -> int | None:
    """Walk RIFF chunks for fmt (byte rate at offset 8 of the chunk body)
    and data (size = payload bytes); duration = data_size / byte_rate."""
    import struct

    byte_rate = data_size = None
    i, n = 12, len(payload)
    while i + 8 <= n:
        cid = payload[i : i + 4]
        size = struct.unpack("<I", payload[i + 4 : i + 8])[0]
        if cid == b"fmt " and size >= 16 and i + 8 + 16 <= n:
            byte_rate = struct.unpack("<I", payload[i + 16 : i + 20])[0]
        elif cid == b"data":
            data_size = size
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if not byte_rate or data_size is None:
        return None
    return int(round(data_size * 1000 / byte_rate))


def _fake_dims(digest: bytes) -> tuple[int, int]:
    return 64 + digest[0] % 192, 64 + digest[1] % 192


def extract_media_meta(df: DataFrame, payload_col: str = "payload", media_type_col: str = "media_type") -> DataFrame:
    """Append a typed metadata struct per payload (deterministic fake for
    dims/duration; byte length + sha are real)."""
    out_schema = T.StructType(df.schema.fields + [T.StructField("meta", MEDIA_META_SCHEMA, False)])

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = []
            for payload, mtype in zip(pdf[payload_col], pdf[media_type_col]):
                payload = bytes(payload) if payload is not None else b""
                digest = hashlib.sha256(payload).digest()
                # real decode first (PNG headers parse stdlib-only);
                # non-decodable payloads keep the deterministic fake
                try:
                    decoded = real_decode(payload, mtype)
                except NotImplementedError:
                    decoded = None
                w, h = _fake_dims(digest)
                duration = 1000 + digest[2] * 100
                if decoded is not None:
                    w = decoded.get("width", w)
                    h = decoded.get("height", h)
                    duration = decoded.get("duration_ms", duration)
                metas.append(
                    {
                        "media_type": mtype,
                        "format": (
                            decoded["format"]
                            if decoded is not None
                            else {"image": "png", "audio": "wav", "video": "mp4"}.get(mtype)
                        ),
                        "n_bytes": len(payload),
                        "sha256": digest.hex(),
                        "width": w if mtype in ("image", "video") else None,
                        "height": h if mtype in ("image", "video") else None,
                        "duration_ms": duration if mtype in ("audio", "video") else None,
                    }
                )
            pdf = pdf.copy()
            pdf["meta"] = metas
            yield pdf

    return df.mapInPandas(gen, schema=out_schema)


def media_features(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    dim: int = 16,
) -> DataFrame:
    """Deterministic fake feature extractor (stands in for a CNN/audio
    embedding): unit-norm vector derived from the payload hash. The
    mapInPandas shape — binary in, fixed-dim float array out, bounded
    batches — is exactly the real extractor's contract."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(payload) if payload is not None else b""
                digest = hashlib.sha256(payload).digest()
                raw = np.frombuffer((digest * ((dim * 4) // len(digest) + 1))[: dim * 4], dtype=np.uint32).astype(np.float64)
                vec = (raw / np.iinfo(np.uint32).max) - 0.5
                norm = np.linalg.norm(vec)
                if norm > 0:
                    vec = vec / norm
                rows.append(
                    {
                        "doc_id": int(did),
                        "media_sha256": digest.hex(),
                        "feature": vec.astype(np.float32).tolist(),
                    }
                )
            yield pd.DataFrame(rows, columns=["doc_id", "media_sha256", "feature"])

    return df.mapInPandas(gen, schema=FEATURE_SCHEMA)


def sample_frames(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    every_ms: int = 1000,
) -> DataFrame:
    """Frame-sampling plumbing: one row per (doc, frame_ts). The fake
    emits hash-derived 'frames'; the real path would seek the container.
    Shape: explode-like fan-out inside mapInPandas keeps the decoder
    state per-payload instead of per-frame."""
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("frame_ts_ms", T.LongType(), False),
            T.StructField("frame_sha256", T.StringType(), False),
        ]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                payload = bytes(payload) if payload is not None else b""
                digest = hashlib.sha256(payload).digest()
                duration = 1000 + digest[2] * 100
                for ts in range(0, duration, every_ms):
                    frame = hashlib.sha256(digest + ts.to_bytes(8, "big")).hexdigest()
                    rows.append({"doc_id": int(did), "frame_ts_ms": ts, "frame_sha256": frame})
            yield pd.DataFrame(rows, columns=["doc_id", "frame_ts_ms", "frame_sha256"])

    return df.mapInPandas(gen, schema=schema)
