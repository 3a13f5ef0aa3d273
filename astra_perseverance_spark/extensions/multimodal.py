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

Decode is TIERED, real wherever a dependency-free path exists:
Pillow / PyAV when importable; otherwise a built-in PNG-subset
decoder (RFC 2083, all five filters), a built-in BASELINE JPEG codec
(``extensions.jpegcodec`` — full ITU T.81 sequential-Huffman decode:
entropy, dequant, IDCT, chroma upsampling, YCbCr→RGB), stdlib WAV,
and a stdlib AVI/RIFF container parse (``_avi_probe``).  Video
payloads in the media table are REAL minimal AVI containers
synthesized with column ops, so the registered queries parse an
actual binary format — ``q_multimodal_frame_sample`` reads the avih
total_frames field out of the payload bytes JVM-side — while the
DuckDB twins recompute the embedded values arithmetically, keeping
the whole round-trip under the driver's hash-match gate.  MJPEG
streams (``##dc`` chunks holding JPEG) get per-frame codec-header
stats (``_jpeg_dims`` → ``avi_frame_stats``) AND real pixel decode
through the baseline codec; what remains ``NotImplementedError`` is
only arithmetic-coded JPEG without Pillow and non-AVI containers
without PyAV (progressive and 12-bit JPEG decode natively as of
round 10).
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
# PNG color type → channel count (3 = palette: one index channel).
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# Adam7 interlace pass grid: (x0, y0, dx, dy) per pass.
_ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]


def _png_unfilter(raw: bytes, h: int, stride: int, bpp: int,
                  offset: int) -> tuple[np.ndarray, int]:
    """Reverse the per-scanline filters over ``h`` lines of ``stride``
    bytes starting at ``raw[offset]`` (filters operate on BYTES with a
    ``bpp``-byte left neighbor, whatever the sample layout).  Returns
    ((h, stride) uint8, offset past the consumed lines)."""
    if len(raw) - offset < h * (stride + 1):
        raise ValueError("PNG data length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        base = offset + y * (stride + 1)
        ftype = raw[base]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=base + 1
        ).astype(np.int32)
        if ftype == 0:
            cur = line
        elif ftype == 2:  # up — vectorized
            cur = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):  # sub/average/paeth need the left pixel
            cur = line.copy()
            pv = prev.astype(np.int32)
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = pv[i]
                if ftype == 1:
                    cur[i] = (cur[i] + a) & 0xFF
                elif ftype == 3:
                    cur[i] = (cur[i] + (a + b) // 2) & 0xFF
                else:
                    c = pv[i - bpp] if i >= bpp else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    cur[i] = (cur[i] + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = out[y]
    return out, offset + h * (stride + 1)


def _png_samples(lines: np.ndarray, w: int, ch: int,
                 depth: int) -> np.ndarray:
    """(h, stride) unfiltered bytes → (h, w, ch) samples (uint8, or
    uint16 for depth 16; sub-byte depths unpack MSB-first)."""
    h = lines.shape[0]
    if depth == 8:
        return lines[:, :w * ch].reshape(h, w, ch)
    if depth == 16:
        return np.frombuffer(lines.tobytes(), dtype=">u2").reshape(
            h, -1)[:, :w * ch].reshape(h, w, ch).astype(np.uint16)
    # depth 1/2/4 — single-channel (grey or palette indices)
    bits = np.unpackbits(lines, axis=1)
    vals = np.zeros((h, bits.shape[1] // depth), dtype=np.uint8)
    for b in range(depth):
        vals = (vals << 1) | bits[:, b::depth]
    return vals[:, :w].reshape(h, w, 1)


def _png_decode(data: bytes) -> np.ndarray:
    """Pure-Python/numpy PNG decode (public spec, RFC 2083 / W3C
    PNG): grey / RGB / grey+alpha / RGBA / palette color types, bit
    depths 1/2/4/8/16, sequential AND Adam7-interlaced.

    This is the dependency-free fallback when Pillow is absent — it
    makes the decode path REAL and testable in a container with no
    imaging library.  Production deployments install Pillow and never
    reach it.  Returns (h, w, channels) uint8 — or uint16 for 16-bit
    depth; palette images resolve through PLTE (+ tRNS alpha when
    present) to RGB/RGBA.  A tRNS color-key on non-palette images is
    ignored (Pillow territory)."""
    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat, meta, plte, trns = 8, b"", None, None, None
    while pos + 8 <= len(data):
        (length,), ctype = struct.unpack(">I", data[pos:pos + 4]), data[pos + 4:pos + 8]
        chunk = data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if ctype == b"IHDR":
            if len(chunk) < 13:
                raise ValueError("PNG IHDR chunk truncated")
            meta = struct.unpack(">IIBBBBB", chunk[:13])
        elif ctype == b"PLTE":
            plte = np.frombuffer(chunk, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = np.frombuffer(chunk, dtype=np.uint8)
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
    if meta is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, _comp, _filt, interlace = meta
    ok = (color in _PNG_CHANNELS and depth in (1, 2, 4, 8, 16)
          and interlace in (0, 1)
          and not (depth < 8 and color not in (0, 3))
          and not (depth == 16 and color == 3))
    if not ok:
        raise NotImplementedError(
            f"PNG subset decoder: unsupported combination "
            f"(depth={depth}, color={color}, interlace={interlace}); "
            f"install Pillow for full coverage")
    if color == 3 and plte is None:
        raise ValueError("palette PNG missing PLTE")
    ch = _PNG_CHANNELS[color]
    raw = zlib.decompress(idat)
    bpp = max(1, ch * depth // 8)
    dtype = np.uint16 if depth == 16 else np.uint8
    samples = np.zeros((h, w, ch), dtype=dtype)
    offset = 0
    for x0, y0, dx, dy in (_ADAM7 if interlace else [(0, 0, 1, 1)]):
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        stride = (pw * ch * depth + 7) // 8
        lines, offset = _png_unfilter(raw, ph, stride, bpp, offset)
        samples[y0::dy, x0::dx] = _png_samples(lines, pw, ch, depth)
    if offset != len(raw):
        raise ValueError("PNG data length mismatch")
    if color == 3:
        idx = samples[:, :, 0]
        if int(idx.max()) >= len(plte):
            raise ValueError("PNG palette index out of range")
        rgb = plte[idx]
        if trns is None:
            return rgb
        alpha = np.full(len(plte), 255, dtype=np.uint8)
        alpha[: len(trns)] = trns
        return np.concatenate([rgb, alpha[idx][..., None]], axis=-1)
    if depth < 8:  # grey 1/2/4 → 8-bit range
        samples = (samples * (255 // ((1 << depth) - 1))).astype(np.uint8)
    return samples


def _wav_decode(data: bytes) -> np.ndarray:
    """PCM WAV decode via the stdlib ``wave`` module — returns an
    (n_frames, n_channels) sample array: uint8 (8-bit), int16
    (16-bit), or int32 (24-bit — sign-extended little-endian triples
    assembled into the high 3 bytes of an int32 then shifted, the
    standard WAV int24 layout — and 32-bit PCM).  Non-PCM encodings
    (float, ADPCM, ...) are the ``wave`` module's declared residue."""
    import wave

    with wave.open(io.BytesIO(data), "rb") as f:
        n, chans, width = f.getnframes(), f.getnchannels(), f.getsampwidth()
        frames = f.readframes(n)
    if width == 3:
        b = np.frombuffer(frames, dtype=np.uint8).reshape(-1, 3)
        out = np.zeros(len(b), dtype=np.int32)
        out |= b[:, 0].astype(np.int32) << 8
        out |= b[:, 1].astype(np.int32) << 16
        out |= b[:, 2].astype(np.int32) << 24
        return (out >> 8).reshape(-1, chans)  # arithmetic: sign extends
    dtype = {1: np.uint8, 2: np.dtype("<i2"), 4: np.dtype("<i4")}.get(width)
    if dtype is None:
        raise NotImplementedError(f"WAV sample width {width} unsupported")
    return np.frombuffer(frames, dtype=dtype).reshape(-1, chans)


def _avi_probe(data: bytes) -> tuple[int, int, int, list[bytes]]:
    """Pure-stdlib AVI (RIFF) container parse — public spec (the
    Microsoft AVI RIFF form): returns (width, height, total_frames,
    frame_chunks) from the ``avih`` main header and the ``movi``
    list's ``##db``/``##dc`` chunks.  A real container read with no
    PyAV/ffmpeg; codec DECODE of compressed streams still needs a
    codec library — for uncompressed DIB (``db``) chunks the bytes
    returned ARE the frame data."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    width = height = n_frames = -1
    frames: list[bytes] = []

    def walk(pos: int, end: int) -> None:
        nonlocal width, height, n_frames
        while pos + 8 <= end:
            cid = data[pos:pos + 4]
            (length,) = struct.unpack("<I", data[pos + 4:pos + 8])
            body = data[pos + 8:pos + 8 + length]
            if cid == b"LIST":
                walk(pos + 12, pos + 8 + length)  # skip the form tag
            elif cid == b"avih":
                if len(body) < 56:
                    # ValueError, not struct.error: malformed-payload
                    # convention (the jpegcodec ADVICE precedent)
                    raise ValueError("AVI avih header truncated")
                f = struct.unpack("<14I", body[:56])
                n_frames, width, height = f[4], f[8], f[9]
            elif len(cid) == 4 and cid[2:4] in (b"db", b"dc"):
                frames.append(body)
            pos += 8 + length + (length & 1)  # chunks are word-aligned

    walk(12, len(data))
    if n_frames < 0:
        raise ValueError("AVI missing avih header")
    return width, height, n_frames, frames


_JPEG_SOI = b"\xff\xd8"
# SOF0–SOF15 minus DHT (C4), JPG (C8), DAC (CC) — ITU T.81 table B.1
_JPEG_SOF_MARKERS = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def _jpeg_dims(data: bytes) -> tuple[int, int]:
    """(height, width) from a JPEG's SOF frame header — a pure-stdlib
    marker-segment walk of the public ITU T.81 / JFIF format.  Reads
    the real codec bitstream header (not container metadata), which
    is exactly what an MJPEG frame sampler needs without a full
    entropy decoder."""
    if data[:2] != _JPEG_SOI:
        raise ValueError("not a JPEG payload")
    pos = 2
    n = len(data)
    while pos + 2 <= n:
        if data[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        # ITU T.81 B.1.1.2: a marker may be preceded by any number of
        # 0xFF fill bytes — the marker code is the first non-FF byte.
        while pos + 1 < n and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > n:
            break
        marker = data[pos + 1]
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:  # standalone
            pos += 2
            continue
        if pos + 4 > n:
            break
        (seglen,) = struct.unpack(">H", data[pos + 2:pos + 4])
        if marker in _JPEG_SOF_MARKERS:
            if pos + 9 > n:
                raise ValueError("truncated JPEG SOF segment")
            h, w = struct.unpack(">HH", data[pos + 5:pos + 9])
            return h, w
        if marker == 0xDA:  # SOS: entropy data — SOF must have come first
            break
        pos += 2 + seglen
    raise ValueError("JPEG missing SOF header")


def avi_frame_stats(payload: bytes) -> list[tuple[int, int, int, int]]:
    """Per-frame (frame_no, height, width, byte_len) for an AVI
    payload.  MJPEG streams (``##dc`` chunks carrying JPEG) get their
    dims from each frame's OWN SOF header via ``_jpeg_dims`` — a real
    per-frame codec-header decode; uncompressed DIB streams report
    the container's avih dims (the chunk bytes are the pixels)."""
    width, height, _n, frames = _avi_probe(payload)
    out = []
    for i, fr in enumerate(frames):
        if fr[:2] == _JPEG_SOI:
            h, w = _jpeg_dims(fr)
        else:
            h, w = height, width
        out.append((i, h, w, len(fr)))
    return out


def decode_media(payload: bytes, media_type: str) -> np.ndarray:
    """Decode an image/audio/video payload into pixel/sample arrays.

    Tiered: Pillow when importable (any image format); otherwise the
    built-in PNG subset decoder (``_png_decode``), the built-in
    baseline JPEG decoder (``extensions.jpegcodec``, pure
    numpy/stdlib per the public ITU T.81 spec) and stdlib WAV decode,
    which keep the decode branch real — and tested, see
    ``tests/test_multimodal.py`` / ``tests/test_jpegcodec.py`` — in
    dependency-free containers.  Video: PyAV when importable (any
    codec); otherwise the stdlib AVI container parse (``_avi_probe``)
    decodes MJPEG streams frame-by-frame through the same baseline
    JPEG codec, and returns raw frame-chunk bytes for uncompressed
    DIB streams (literal pixel data).

    The library tiers fall back on FAILURE, not just absence: an
    installed Pillow cannot decode 12-bit JPEG (libjpeg is 8-bit) and
    an installed PyAV rejects the engine's own minimal synthesized
    AVIs — payloads the built-in codecs handle — so a library error
    falls through to the builtins rather than regressing the
    dependency-free surface.  The remaining ``NotImplementedError``
    surface: non-AVI video without PyAV, and arithmetic-coded JPEG
    frames without Pillow (progressive and 12-bit decode natively)."""
    if media_type == "image":
        try:
            from PIL import Image  # optional dependency
            return np.asarray(Image.open(io.BytesIO(payload)))
        except Exception:  # noqa: BLE001 — absent OR failed: builtins next
            if payload[:8] == _PNG_SIG:
                return _png_decode(payload)
            if payload[:2] == _JPEG_SOI:
                return _jpeg_pixels(payload)
            raise NotImplementedError(
                "non-PNG/JPEG image decode requires Pillow") from None
    if media_type == "audio":
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            return _wav_decode(payload)
        raise NotImplementedError("non-WAV audio decode requires soundfile")
    try:
        import av  # optional dependency

        with av.open(io.BytesIO(payload)) as container:
            return np.stack([
                frame.to_ndarray(format="rgb24")
                for frame in container.decode(video=0)
            ])
    except Exception:  # noqa: BLE001 — absent OR failed: builtins next
        if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
            *_dims, frames = _avi_probe(payload)
            if frames and frames[0][:2] == _JPEG_SOI:
                # MJPEG: per-frame pixel decode through the shared
                # Pillow-else-builtin JPEG tier
                return np.stack([_jpeg_pixels(fr) for fr in frames])
            return np.frombuffer(b"".join(frames), dtype=np.uint8)
        raise NotImplementedError(
            "non-AVI video decode requires PyAV/ffmpeg") from None


def _jpeg_pixels(payload: bytes) -> np.ndarray:
    """The ONE Pillow-else-builtin JPEG pixel tier, shared by the
    image branch and the per-frame MJPEG branch: Pillow when it is
    both importable AND succeeds (any JPEG flavor), else the built-in
    codec (``extensions.jpegcodec``, pure numpy/stdlib per ITU T.81
    incl. progressive and 12-bit; arithmetic frames raise
    NotImplementedError there)."""
    try:
        from PIL import Image  # optional dependency
        return np.asarray(Image.open(io.BytesIO(payload)))
    except Exception:  # noqa: BLE001 — absent OR failed: builtin next
        from astra_perseverance_spark.extensions.jpegcodec import (
            decode_baseline_jpeg,
        )

        return decode_baseline_jpeg(payload)


def _le32_hex(c: F.Column) -> F.Column:
    """Hex string of a value as a little-endian u32 (byte-swapped
    8-nibble hex) — the RIFF/AVI integer encoding, built with plain
    string ops so container synthesis stays JVM-side."""
    h = F.lpad(F.hex(c.cast("bigint")), 8, "0")
    return F.concat(
        F.substring(h, 7, 2), F.substring(h, 5, 2),
        F.substring(h, 3, 2), F.substring(h, 1, 2),
    )


def _u32_from_le_bytes(binary_slice: F.Column) -> F.Column:
    """BIGINT from 4 little-endian bytes of a binary column — the
    column-ops twin of ``struct.unpack('<I', ...)``."""
    h = F.hex(binary_slice)
    return F.conv(
        F.concat(
            F.substring(h, 7, 2), F.substring(h, 5, 2),
            F.substring(h, 3, 2), F.substring(h, 1, 2),
        ),
        16, 10,
    ).cast("long")


# Fixed AVI layout offsets inside the synthesized payload (after the
# 4-byte MAGIC): avih total_frames / width / height u32 fields, and
# the start of the movi chunk's data (= the document's utf-8 bytes).
# payload = MAGIC ‖ RIFF(size) 'AVI ' ‖ LIST(68) 'hdrl' avih(56) ‖
#           LIST(12+L) 'movi' '00db'(L) text
AVI_NFRAMES_POS = 53   # 1-based, 4 bytes LE
AVI_WIDTH_POS = 69
AVI_HEIGHT_POS = 73
AVI_TEXT_POS = 113     # 1-based start of the movi chunk data
AVI_OVERHEAD = 112     # bytes before the text content

_Z4 = "00000000"  # one zero u32


def build_media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, meta struct, payload binary).

    Metadata is arithmetic on doc_id (deterministic, SQL-mirrorable).
    Image/audio payloads are magic + utf-8 text bytes; VIDEO payloads
    are magic + a REAL minimal AVI container (RIFF form, public
    spec): an ``avih`` main header carrying the same deterministic
    width/height/n_frames, and the utf-8 text as the single ``movi``
    ``00db`` chunk.  The container is synthesized entirely with
    column ops (hex-string assembly + ``unhex``), so the table build
    stays JVM-side and the downstream consumers genuinely PARSE a
    container rather than trusting the metadata struct."""
    from astra_perseverance_spark.extensions.corpus import docs_frame
    d = docs_frame(spark, sf_dir)  # cached, pre-partitioned for batch work
    did = F.col("doc_id")
    media_type = (
        F.when(did % 3 == 0, "image").when(did % 3 == 1, "audio").otherwise("video")
    )
    width = (64 + did % 960).cast("int")
    height = (64 + (did * 7) % 540).cast("int")
    n_frames = (1 + did % 8).cast("int")
    text_bytes = F.encode("text", "utf-8")
    L = F.octet_length(text_bytes)
    avi_hex = F.concat(
        F.lit("52494646"), _le32_hex(L + 100), F.lit("41564920"),  # RIFF…AVI(space)
        F.lit("4C495354"), F.lit("44000000"), F.lit("6864726C"),  # LIST 68 hdrl
        F.lit("61766968"), F.lit("38000000"),                     # avih 56
        F.lit("409C0000"),          # us_per_frame = 40000 (25 fps)
        F.lit(_Z4), F.lit(_Z4), F.lit(_Z4),  # max_bps, padding, flags
        _le32_hex(n_frames),        # total_frames — the field under test
        F.lit(_Z4), F.lit("01000000"), F.lit(_Z4),  # initial, streams=1, buf
        _le32_hex(width), _le32_hex(height),
        F.lit(_Z4), F.lit(_Z4), F.lit(_Z4), F.lit(_Z4),  # reserved[4]
        F.lit("4C495354"), _le32_hex(L + 12), F.lit("6D6F7669"),  # LIST movi
        F.lit("30306462"), _le32_hex(L),                          # 00db chunk
        F.hex(text_bytes),
    )
    payload = F.when(
        media_type == "video",
        F.concat(F.lit(MAGIC), F.unhex(avi_hex)),
    ).otherwise(F.concat(F.lit(MAGIC), text_bytes))
    return d.select(
        "doc_id",
        F.struct(
            media_type.alias("media_type"),
            width.alias("width"),
            height.alias("height"),
            n_frames.alias("n_frames"),
        ).alias("meta"),
        payload.alias("payload"),
    )


def _extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched feature extraction.

    Image/audio rows: strip the 4-byte magic, hash the content (md5
    prefix → 60-bit int — the same ``h15`` the SQL twin computes),
    report byte length.  VIDEO rows: a REAL container read —
    ``_avi_probe`` parses the RIFF/AVI structure and the reported
    width/height/n_frames come from the ``avih`` header, the content
    from the ``movi`` chunk bytes (the synthesized container embeds
    the same deterministic values, so the oracle twin checks the
    parse end-to-end).  Batch-shaped exactly like a production
    decoder would be."""
    for pdf in batches:
        # one columnar unpack of the struct instead of 4 per-row maps
        meta = pd.DataFrame(pdf["meta"].tolist(), index=pdf.index)
        is_video = meta["media_type"] == "video"
        probed = pdf.loc[is_video, "payload"].map(
            lambda p: _avi_probe(bytes(p)[len(MAGIC):])
        )
        width = meta["width"].copy()
        height = meta["height"].copy()
        n_frames = meta["n_frames"].copy()
        content = pdf["payload"].str[len(MAGIC):]
        if is_video.any():
            width.loc[is_video] = probed.map(lambda t: t[0])
            height.loc[is_video] = probed.map(lambda t: t[1])
            n_frames.loc[is_video] = probed.map(lambda t: t[2])
            content.loc[is_video] = probed.map(
                lambda t: b"".join(t[3]))
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "media_type": meta["media_type"],
            "width": width,
            "height": height,
            "n_frames": n_frames,
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

    ``n_frames`` is READ FROM THE CONTAINER: the avih total_frames
    u32 is sliced out of the payload bytes and decoded little-endian
    with column ops (``_u32_from_le_bytes`` — hex + byte-swap +
    conv), i.e. a real binary-format field read inside whole-stage
    codegen, not a copy of the metadata struct; the DuckDB twin
    recomputes the value arithmetically, so the driver's hash gate
    verifies the container round-trip.  byte_len is the movi chunk's
    content length.  est_bytes models an even split of the content
    across frames: byte_len div n_frames (integer division, exact)."""
    media = build_media_table(spark, sf_dir).filter(
        F.col("meta.media_type") == "video"
    )
    d = media.select(
        "doc_id",
        _u32_from_le_bytes(
            F.substring("payload", AVI_NFRAMES_POS, 4)
        ).cast("int").alias("n_frames"),
        (F.octet_length("payload") - F.lit(AVI_OVERHEAD))
        .cast("long").alias("byte_len"),
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
