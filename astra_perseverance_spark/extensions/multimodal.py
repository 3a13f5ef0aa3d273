"""Multimodal column plumbing: opaque binary payloads + typed metadata,
decoded/feature-extracted through Arrow-batched ``mapInPandas``.

The Spark-side architecture is real and tested end to end:

- payloads are a ``binary`` column (here synthesized from the document
  text — utf-8 bytes prefixed with a 4-byte magic — because no real
  media ships with the test data);
- metadata travels as a typed struct (media_type, width, height,
  n_frames) next to the payload, never inside it, so partition
  pruning/column projection work on metadata without touching bytes;
- feature extraction runs in ``mapInPandas`` over Arrow record
  batches — the production shape for image decode: the Python worker
  sees a ``pandas.DataFrame`` per batch, returns one conforming to an
  explicit output schema.

The actual image/audio/video decode is STUBBED (``decode_media`` below
raises ``NotImplementedError`` — Pillow/ffmpeg are not in this
container); ``_extract_features`` is the deterministic fake used by
the registered query, chosen so a DuckDB oracle can mirror it
(md5-prefix content hash + byte length), keeping the Arrow plumbing
under the driver's hash-match gate.
"""

from __future__ import annotations

import hashlib
import io
import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MAGIC = b"APSE"  # payload header magic

FEATURE_SCHEMA = (
    "doc_id long, media_type string, width int, height int, n_frames int, "
    "byte_len long, content_h15 long"
)

_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# PNG color type → channel count (8-bit, non-interlaced support only).
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_decode(data: bytes) -> np.ndarray:
    """Pure-Python/numpy PNG decode (public spec, RFC 2083): 8-bit
    depth, non-interlaced, grey/RGB/grey+alpha/RGBA.

    This is the dependency-free fallback when Pillow is absent — it
    makes the decode path REAL and testable in a container with no
    imaging library, at the cost of supporting only the common PNG
    subset.  Production deployments install Pillow and never reach it.
    Returns an (h, w, channels) uint8 array."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat, meta = 8, b"", None
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos:pos + 4]), data[pos + 4:pos + 8]
        chunk = data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if ctype == b"IHDR":
            meta = struct.unpack(">IIBBBBB", chunk)
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
    if meta is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, _comp, _filt, interlace = meta
    if depth != 8 or interlace != 0 or color not in _PNG_CHANNELS:
        raise NotImplementedError(
            f"PNG subset decoder handles 8-bit non-interlaced "
            f"grey/RGB/LA/RGBA only (depth={depth}, color={color}, "
            f"interlace={interlace}); install Pillow for full coverage")
    ch = _PNG_CHANNELS[color]
    stride = w * ch
    raw = zlib.decompress(idat)
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int32)
        if ftype == 0:
            cur = line
        elif ftype == 2:  # up — vectorized
            cur = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):  # sub/average/paeth need the left pixel
            cur = line.copy()
            pv = prev.astype(np.int32)
            for i in range(stride):
                a = cur[i - ch] if i >= ch else 0
                b = pv[i]
                if ftype == 1:
                    cur[i] = (cur[i] + a) & 0xFF
                elif ftype == 3:
                    cur[i] = (cur[i] + (a + b) // 2) & 0xFF
                else:
                    c = pv[i - ch] if i >= ch else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    cur[i] = (cur[i] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = out[y]
    return out.reshape(h, w, ch)


def _wav_decode(data: bytes) -> np.ndarray:
    """PCM WAV decode via the stdlib ``wave`` module — returns an
    (n_frames, n_channels) int16/uint8 sample array."""
    import wave

    with wave.open(io.BytesIO(data), "rb") as f:
        n, chans, width = f.getnframes(), f.getnchannels(), f.getsampwidth()
        frames = f.readframes(n)
    dtype = {1: np.uint8, 2: np.dtype("<i2")}.get(width)
    if dtype is None:
        raise NotImplementedError(f"WAV sample width {width} unsupported")
    return np.frombuffer(frames, dtype=dtype).reshape(-1, chans)


def decode_media(payload: bytes, media_type: str) -> np.ndarray:
    """Decode an image/audio payload into pixel/sample arrays.

    Tiered: Pillow when importable (any image format); otherwise the
    built-in PNG subset decoder (``_png_decode``) and stdlib WAV
    decode, which keep the decode branch real — and tested, see
    ``tests/test_multimodal.py`` — in dependency-free containers.
    Video decode genuinely needs PyAV/ffmpeg and stays
    ``NotImplementedError`` when neither is present."""
    if media_type == "image":
        try:
            from PIL import Image  # optional dependency
            return np.asarray(Image.open(io.BytesIO(payload)))
        except ImportError:
            if payload[:8] == _PNG_SIG:
                return _png_decode(payload)
            raise NotImplementedError(
                "non-PNG image decode requires Pillow") from None
    if media_type == "audio":
        if payload[:4] == b"RIFF":
            return _wav_decode(payload)
        raise NotImplementedError("non-WAV audio decode requires soundfile")
    raise NotImplementedError("video decode requires PyAV/ffmpeg")


def build_media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, meta struct, payload binary).

    Metadata is arithmetic on doc_id (deterministic, SQL-mirrorable);
    the payload is magic + utf-8 text bytes."""
    from astra_perseverance_spark.extensions.corpus import docs_frame
    d = docs_frame(spark, sf_dir)  # cached, pre-partitioned for batch work
    did = F.col("doc_id")
    media_type = (
        F.when(did % 3 == 0, "image").when(did % 3 == 1, "audio").otherwise("video")
    )
    return d.select(
        "doc_id",
        F.struct(
            media_type.alias("media_type"),
            (64 + did % 960).cast("int").alias("width"),
            (64 + (did * 7) % 540).cast("int").alias("height"),
            (1 + did % 8).cast("int").alias("n_frames"),
        ).alias("meta"),
        F.concat(F.lit(MAGIC), F.encode("text", "utf-8")).alias("payload"),
    )


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched feature extraction (the decode stand-in).

    Per row: strip the 4-byte magic, hash the content (md5 prefix →
    60-bit int — the same ``h15`` the SQL twin computes), report byte
    length.  Batch-shaped exactly like a real decoder would be."""
    for pdf in batches:
        # one columnar unpack of the struct instead of 4 per-row maps
        meta = pd.DataFrame(pdf["meta"].tolist(), index=pdf.index)
        content = pdf["payload"].str[len(MAGIC):]
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "media_type": meta["media_type"],
            "width": meta["width"],
            "height": meta["height"],
            "n_frames": meta["n_frames"],
            "byte_len": content.str.len(),
            "content_h15": content.map(
                lambda c: int(hashlib.md5(c).hexdigest()[:15], 16)
            ),
        })


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered query: build the media table, run the Arrow-batched
    extractor, emit typed features ordered by doc_id.

    Scale: ``mapInPandas`` is partition-parallel with Arrow transfer —
    the only Python in the repo's hot paths, and it is batch-
    vectorized, never row-at-a-time."""
    media = build_media_table(spark, sf_dir)
    feats = media.mapInPandas(_extract_features, schema=FEATURE_SCHEMA)
    return feats.orderBy("doc_id")


def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plan for video payloads: explode each video's
    frame index space at a stride of 2 (sample every other frame),
    carrying (frame_no, est_bytes) — pure column ops, no Python.

    est_bytes models an even split of the payload across frames:
    byte_len div n_frames (integer division, exact)."""
    media = build_media_table(spark, sf_dir).filter(
        F.col("meta.media_type") == "video"
    )
    d = media.select(
        "doc_id",
        F.col("meta.n_frames").alias("n_frames"),
        (F.octet_length("payload") - F.lit(len(MAGIC))).cast("long").alias("byte_len"),
    )
    return (
        d.select(
            "doc_id", "n_frames", "byte_len",
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(2))
            ).alias("frame_no"),
        )
        .select(
            "doc_id", "frame_no", "n_frames",
            F.expr("byte_len div n_frames").alias("est_bytes"),
        )
        .orderBy("doc_id", "frame_no")
    )
