"""Real media decode: the PNG/WAV decode branch of
``extensions.multimodal.decode_media`` exercised with payloads
generated in pure Python (the PNG spec needs only zlib + struct, both
stdlib), end-to-end through the Arrow ``mapInPandas`` plumbing.

The stub (NotImplementedError) now fires only for formats that
genuinely need an absent dependency (non-PNG images without Pillow,
video without PyAV)."""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np
import pytest


def make_png(pixels: np.ndarray, filter_type: int = 0) -> bytes:
    """Minimal pure-Python PNG encoder for test payloads: 8-bit,
    non-interlaced.  ``pixels`` is (h, w, ch) uint8 with ch ∈
    {1, 2, 3, 4}.  ``filter_type`` applies one filter to every
    scanline (0=None, 1=Sub, 2=Up) so the decoder's unfilter paths
    can each be hit."""
    h, w, ch = pixels.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    raw = b""
    prev = np.zeros(w * ch, dtype=np.int32)
    for y in range(h):
        line = pixels[y].reshape(-1).astype(np.int32)
        if filter_type == 0:
            filt = line
        elif filter_type == 2:
            filt = (line - prev) & 0xFF
        elif filter_type == 1:
            left = np.concatenate([np.zeros(ch, dtype=np.int32), line[:-ch]])
            filt = (line - left) & 0xFF
        else:
            raise ValueError(filter_type)
        raw += bytes([filter_type]) + bytes(filt.astype(np.uint8))
        prev = line
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))


def make_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """(n, ch) int16 samples → RIFF/WAV bytes via the stdlib."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(samples.shape[1])
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


class TestDecodeMedia:
    def test_png_roundtrip_1x1(self):
        from astra_perseverance_spark.extensions.multimodal import decode_media

        px = np.array([[[200, 30, 7]]], dtype=np.uint8)
        got = decode_media(make_png(px), "image")
        assert got.shape == (1, 1, 3)
        assert np.array_equal(got, px)

    @pytest.mark.parametrize("filter_type", [0, 1, 2])
    @pytest.mark.parametrize("channels", [1, 3, 4])
    def test_png_roundtrip_filters_and_channels(self, filter_type, channels):
        from astra_perseverance_spark.extensions.multimodal import decode_media

        rng = np.random.default_rng(42 + filter_type * 8 + channels)
        px = rng.integers(0, 256, size=(5, 7, channels), dtype=np.uint8)
        got = decode_media(make_png(px, filter_type), "image")
        assert np.array_equal(got, px), (filter_type, channels)

    def test_png_paeth_average_via_subset_decoder(self):
        """Filters 3/4 aren't produced by the test encoder; feed the
        subset decoder scanlines filtered by hand (average over a
        known row reduces to up+left/2)."""
        from astra_perseverance_spark.extensions.multimodal import _png_decode

        # 2x2 grey: encode row0 None, row1 Average by hand
        row0 = np.array([10, 20], dtype=np.int32)
        row1 = np.array([30, 40], dtype=np.int32)
        filt1 = [
            (30 - (0 + 10) // 2) & 0xFF,          # left=0 (first col), up=10
            (40 - (30 + 20) // 2) & 0xFF,         # left=30, up=20
        ]
        raw = bytes([0]) + bytes(row0.astype(np.uint8)) \
            + bytes([3]) + bytes(filt1)
        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)

        def chunk(ctype, data):
            return (struct.pack(">I", len(data)) + ctype + data
                    + struct.pack(">I", zlib.crc32(ctype + data)))

        png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
               + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))
        got = _png_decode(png)
        assert got.reshape(2, 2).tolist() == [[10, 20], [30, 40]]

    def test_wav_roundtrip(self):
        from astra_perseverance_spark.extensions.multimodal import decode_media

        s = (np.sin(np.linspace(0, 6.28, 64))[:, None] * 1000).astype(np.int16)
        got = decode_media(make_wav(s), "audio")
        assert got.shape == (64, 1)
        assert np.array_equal(got.astype(np.int16), s)

    def test_undecodable_formats_raise(self):
        from astra_perseverance_spark.extensions.multimodal import decode_media

        try:
            import PIL  # noqa: F401
            has_pil = True
        except ImportError:
            has_pil = False
        if not has_pil:
            with pytest.raises(NotImplementedError):
                decode_media(b"APSE1234", "image")  # not a PNG, no Pillow
        with pytest.raises(NotImplementedError):
            decode_media(b"APSE1234", "audio")  # not RIFF
        try:
            import av  # noqa: F401
            has_av = True
        except ImportError:
            has_av = False
        if not has_av:
            with pytest.raises(NotImplementedError):
                decode_media(b"\x00\x00\x01\xba", "video")  # MPEG-PS, no PyAV

    def test_avi_probe_roundtrip(self):
        """The synthesized container (build_media_table's column-ops
        hex assembly) parses back through the pure-stdlib AVI walker
        with the exact written values, and decode_media returns the
        raw movi chunk bytes for it."""
        import struct as st

        from astra_perseverance_spark.extensions.multimodal import (
            _avi_probe,
            decode_media,
        )

        def make_avi(w, h, nf, content: bytes) -> bytes:
            avih = st.pack("<14I", 40000, 0, 0, 0, nf, 0, 1, 0, w, h,
                           0, 0, 0, 0)
            hdrl = b"LIST" + st.pack("<I", 68) + b"hdrl" \
                + b"avih" + st.pack("<I", 56) + avih
            movi = b"LIST" + st.pack("<I", 12 + len(content)) + b"movi" \
                + b"00db" + st.pack("<I", len(content)) + content
            body = b"AVI " + hdrl + movi
            return b"RIFF" + st.pack("<I", len(body)) + body

        avi = make_avi(320, 240, 7, b"frame-bytes")
        w, h, nf, frames = _avi_probe(avi)
        assert (w, h, nf) == (320, 240, 7)
        assert frames == [b"frame-bytes"]
        arr = decode_media(avi, "video")
        assert bytes(arr.tobytes()) == b"frame-bytes"

    def test_avi_probe_rejects_corrupt_container(self):
        from astra_perseverance_spark.extensions.multimodal import _avi_probe

        with pytest.raises(ValueError):
            _avi_probe(b"RIFFxxxxWAVE")  # RIFF but not an AVI form
        with pytest.raises(ValueError):
            # valid RIFF/AVI framing but no avih header anywhere
            import struct as st
            _avi_probe(b"RIFF" + st.pack("<I", 4) + b"AVI ")


class TestSynthesizedAviThroughSpark:
    def test_media_table_video_payloads_are_real_avi(self, spark):
        """The column-ops hex assembly in build_media_table produces
        containers the independent Python walker parses back with the
        exact metadata values and the document text as the movi
        chunk — and the registered frame-sample query's JVM-side
        total_frames field read agrees row for row."""
        from tests.conftest import SF_SMALL

        from astra_perseverance_spark.extensions.multimodal import (
            MAGIC,
            _avi_probe,
            build_media_table,
            q_multimodal_frame_sample,
        )

        media = build_media_table(spark, SF_SMALL).filter(
            "meta.media_type = 'video'")
        rows = media.limit(8).collect()
        assert rows
        for r in rows:
            w, h, nf, frames = _avi_probe(bytes(r["payload"])[len(MAGIC):])
            assert (w, h, nf) == (r["meta"]["width"], r["meta"]["height"],
                                  r["meta"]["n_frames"])
            assert len(frames) == 1 and len(frames[0]) > 0
        want = {r["doc_id"]: r["meta"]["n_frames"] for r in media.collect()}
        got = {
            r["doc_id"]: r["n_frames"]
            for r in q_multimodal_frame_sample(spark, SF_SMALL).collect()
        }
        assert got == want


class TestDecodeThroughSpark:
    def test_mapinpandas_decodes_real_pngs(self, spark):
        """Real PNG payloads through the Arrow batch path: decode each
        payload in a ``mapInPandas`` worker and emit measured
        (height, width, channels, mean) — proving the binary-column +
        batch-UDF plumbing carries real media, not just the synthetic
        fixtures."""
        import pandas as pd

        rng = np.random.default_rng(7)
        rows = []
        want = {}
        for i in range(6):
            h, w = 2 + i, 3 + i
            px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            rows.append((i, bytearray(make_png(px, filter_type=i % 3))))
            want[i] = (h, w, 3, float(px.mean()))
        df = spark.createDataFrame(rows, "doc_id long, payload binary") \
            .repartition(3)

        def decode(batches):
            from astra_perseverance_spark.extensions.multimodal import (
                decode_media,
            )
            for pdf in batches:
                arrs = [decode_media(bytes(p), "image")
                        for p in pdf["payload"]]
                yield pd.DataFrame({
                    "doc_id": pdf["doc_id"],
                    "height": [a.shape[0] for a in arrs],
                    "width": [a.shape[1] for a in arrs],
                    "channels": [a.shape[2] for a in arrs],
                    "mean_val": [float(a.mean()) for a in arrs],
                })

        got = {
            r["doc_id"]: (r["height"], r["width"], r["channels"],
                          r["mean_val"])
            for r in df.mapInPandas(
                decode,
                "doc_id long, height int, width int, channels int, "
                "mean_val double").collect()
        }
        assert got == want

    def test_mapinpandas_decodes_real_mjpeg_avis(self, spark):
        """Real MJPEG video payloads through the Arrow batch path:
        each worker decodes the AVI's JPEG frames to PIXELS via the
        built-in baseline codec (or Pillow) and emits frame-count +
        mean intensity, matching the encoded source up to
        quantization error."""
        import pandas as pd

        from astra_perseverance_spark.extensions.jpegcodec import (
            encode_baseline_jpeg,
        )

        yy, xx = np.mgrid[0:16, 0:16]
        rows, want = [], {}
        for i in range(4):
            frames_px = [((yy * (i + 2) + xx * f) % 256).astype(np.uint8)
                         for f in range(1, 3)]
            frames = [encode_baseline_jpeg(p) for p in frames_px]
            avi = _mk_mjpeg_avi(frames, width=16, height=16)
            rows.append((i, bytearray(avi)))
            want[i] = (2, float(np.mean([p.mean() for p in frames_px])))
        df = spark.createDataFrame(rows, "doc_id long, payload binary") \
            .repartition(2)

        def decode(batches):
            from astra_perseverance_spark.extensions.multimodal import (
                decode_media,
            )
            for pdf in batches:
                out_n, out_mean = [], []
                for p in pdf["payload"]:
                    arr = decode_media(bytes(p), "video")
                    out_n.append(int(arr.shape[0]))
                    out_mean.append(float(arr.mean()))
                yield pd.DataFrame({
                    "doc_id": pdf["doc_id"],
                    "n_frames": out_n,
                    "mean_val": out_mean,
                })

        got = {
            r["doc_id"]: (r["n_frames"], r["mean_val"])
            for r in df.mapInPandas(
                decode, "doc_id long, n_frames int, mean_val double"
            ).collect()
        }
        assert set(got) == set(want)
        for i, (n, mean) in want.items():
            assert got[i][0] == n
            assert abs(got[i][1] - mean) < 4.0, (i, got[i], mean)


def _mk_jpeg(h: int, w: int) -> bytes:
    """Minimal structurally-valid JPEG header stream: SOI + JFIF APP0
    + SOF0 carrying (h, w) + SOS + fake entropy bytes + EOI.  Enough
    for any marker-walking header parser; not entropy-decodable."""
    import struct as st

    app0 = b"\xff\xe0" + st.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + st.pack(">HH", 1, 1) + b"\x00\x00"
    sof0 = b"\xff\xc0" + st.pack(">H", 17) + b"\x08" \
        + st.pack(">HH", h, w) + b"\x03" \
        + b"\x01\x22\x00" + b"\x02\x11\x01" + b"\x03\x11\x01"
    sos = b"\xff\xda" + st.pack(">H", 12) + b"\x03" \
        + b"\x01\x00\x02\x11\x03\x11" + b"\x00\x3f\x00"
    return b"\xff\xd8" + app0 + sof0 + sos + b"\x12\x34\x56" + b"\xff\xd9"


def _mk_mjpeg_avi(frames: list[bytes], width: int, height: int) -> bytes:
    """Minimal AVI (RIFF) container holding ``frames`` as ``00dc``
    (compressed) chunks — the MJPEG layout."""
    import struct as st

    avih = st.pack("<14I", 40000, 0, 0, 0, len(frames), 0, 1, 0,
                   width, height, 0, 0, 0, 0)
    hdrl = b"LIST" + st.pack("<I", 4 + 8 + 56) + b"hdrl" \
        + b"avih" + st.pack("<I", 56) + avih
    movi_body = b""
    for fr in frames:
        movi_body += b"00dc" + st.pack("<I", len(fr)) + fr
        if len(fr) % 2:
            movi_body += b"\x00"  # chunks are word-aligned
    movi = b"LIST" + st.pack("<I", 4 + len(movi_body)) + b"movi" + movi_body
    body = b"AVI " + hdrl + movi
    return b"RIFF" + st.pack("<I", len(body)) + body


class TestMjpeg:
    def test_jpeg_dims_reads_sof_header(self):
        from astra_perseverance_spark.extensions.multimodal import _jpeg_dims

        assert _jpeg_dims(_mk_jpeg(480, 640)) == (480, 640)
        assert _jpeg_dims(_mk_jpeg(1, 65535)) == (1, 65535)
        with pytest.raises(ValueError):
            _jpeg_dims(b"APSE not a jpeg")

    def test_jpeg_dims_skips_fill_bytes(self):
        """ITU T.81 B.1.1.2: a marker may be padded by any number of
        0xFF fill bytes — they are not markers carrying lengths, so
        the walk must not desync on them (ADVICE r7)."""
        from astra_perseverance_spark.extensions.multimodal import _jpeg_dims

        jpeg = _mk_jpeg(12, 34)
        sof_at = jpeg.index(b"\xff\xc0")
        padded = jpeg[:sof_at] + b"\xff\xff\xff" + jpeg[sof_at:]
        assert _jpeg_dims(padded) == (12, 34)

    def test_jpeg_dims_truncated_sof_raises_valueerror(self):
        """A SOF segment cut off before its dims raises the documented
        ValueError, never struct.error (ADVICE r7)."""
        from astra_perseverance_spark.extensions.multimodal import _jpeg_dims

        jpeg = _mk_jpeg(12, 34)
        sof_at = jpeg.index(b"\xff\xc0")
        with pytest.raises(ValueError):
            _jpeg_dims(jpeg[:sof_at + 4])  # marker + seglen, no dims

    def test_avi_frame_stats_decodes_mjpeg_frame_headers(self):
        """Per-frame dims come from each frame's OWN SOF header (a
        real codec-header decode), not the container metadata: the
        two frames carry different dims than the avih header."""
        from astra_perseverance_spark.extensions.multimodal import (
            avi_frame_stats,
        )

        f0, f1 = _mk_jpeg(120, 160), _mk_jpeg(240, 321)
        avi = _mk_mjpeg_avi([f0, f1], width=999, height=888)
        stats = avi_frame_stats(avi)
        assert stats == [(0, 120, 160, len(f0)), (1, 240, 321, len(f1))]

    def test_avi_frame_stats_dib_falls_back_to_container_dims(self):
        from astra_perseverance_spark.extensions.multimodal import (
            avi_frame_stats,
        )
        from astra_perseverance_spark.extensions.multimodal import _avi_probe

        import struct as st
        raw = b"\x01\x02\x03\x04"
        avih = st.pack("<14I", 40000, 0, 0, 0, 1, 0, 1, 0, 2, 2,
                       0, 0, 0, 0)
        hdrl = b"LIST" + st.pack("<I", 4 + 8 + 56) + b"hdrl" \
            + b"avih" + st.pack("<I", 56) + avih
        movi = b"LIST" + st.pack("<I", 4 + 8 + len(raw)) + b"movi" \
            + b"00db" + st.pack("<I", len(raw)) + raw
        body = b"AVI " + hdrl + movi
        avi = b"RIFF" + st.pack("<I", len(body)) + body
        assert _avi_probe(avi)[:3] == (2, 2, 1)
        assert avi_frame_stats(avi) == [(0, 2, 2, len(raw))]

    def test_decode_media_mjpeg_tier(self):
        """The MJPEG branch routes every frame through a real JPEG
        codec (Pillow when importable, else the built-in baseline
        decoder): a REAL encoded MJPEG AVI decodes to stacked pixel
        frames, and the structurally-valid-but-garbage header-only
        fixture JPEG raises a codec error rather than silently
        returning entropy bytes as pixels."""
        from astra_perseverance_spark.extensions.jpegcodec import (
            encode_baseline_jpeg,
        )
        from astra_perseverance_spark.extensions.multimodal import decode_media

        yy, xx = np.mgrid[0:16, 0:16]
        f0 = ((yy * 7 + xx * 3) % 256).astype(np.uint8)
        f1 = ((yy * 2 + xx * 9) % 256).astype(np.uint8)
        frames = [encode_baseline_jpeg(f0), encode_baseline_jpeg(f1)]
        avi = _mk_mjpeg_avi(frames, width=16, height=16)
        out = decode_media(avi, "video")
        assert out.shape[0] == 2 and out.shape[1:3] == (16, 16)
        assert out.dtype == np.uint8
        # pixel-accurate up to quantization error
        got0 = out[0] if out[0].ndim == 2 else out[0][..., 0]
        assert np.abs(got0.astype(int) - f0.astype(int)).mean() < 4

        # garbage entropy: a codec error, never raw bytes as pixels
        bad = _mk_mjpeg_avi([_mk_jpeg(2, 2)], width=2, height=2)
        with pytest.raises(Exception):
            decode_media(bad, "video")

    def test_dib_avi_still_returns_raw_bytes(self):
        import numpy as np

        from astra_perseverance_spark.extensions.multimodal import decode_media

        import struct as st
        raw = b"\x01\x02\x03\x04"
        avih = st.pack("<14I", 40000, 0, 0, 0, 1, 0, 1, 0, 2, 2,
                       0, 0, 0, 0)
        hdrl = b"LIST" + st.pack("<I", 4 + 8 + 56) + b"hdrl" \
            + b"avih" + st.pack("<I", 56) + avih
        movi = b"LIST" + st.pack("<I", 4 + 8 + len(raw)) + b"movi" \
            + b"00db" + st.pack("<I", len(raw)) + raw
        body = b"AVI " + hdrl + movi
        avi = b"RIFF" + st.pack("<I", len(body)) + body
        try:
            import av  # noqa: F401
            return  # PyAV owns the video path when importable
        except ImportError:
            pass
        assert np.array_equal(
            decode_media(avi, "video"),
            np.frombuffer(raw, dtype=np.uint8))


class TestExtendedPngWav:
    """Round-10 widening of the dependency-free decoders: palette /
    16-bit / sub-byte-depth / Adam7-interlaced PNG, and 24/32-bit PCM
    WAV.  All payloads are hand-built from the public specs."""

    @staticmethod
    def _chunk(ctype, data):
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data)))

    def _png(self, ihdr, idat_raw, extra=b""):
        return (b"\x89PNG\r\n\x1a\n" + self._chunk(b"IHDR", ihdr) + extra
                + self._chunk(b"IDAT", zlib.compress(idat_raw))
                + self._chunk(b"IEND", b""))

    def test_palette_png_with_and_without_trns(self):
        from astra_perseverance_spark.extensions.multimodal import _png_decode

        plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 7, 8, 9])
        idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0]], dtype=np.uint8)
        raw = b"".join(bytes([0]) + bytes(row) for row in idx)
        ihdr = struct.pack(">IIBBBBB", 4, 2, 8, 3, 0, 0, 0)
        got = _png_decode(self._png(ihdr, raw,
                                    extra=self._chunk(b"PLTE", plte)))
        want = np.frombuffer(plte, np.uint8).reshape(4, 3)[idx]
        assert got.shape == (2, 4, 3) and np.array_equal(got, want)
        # tRNS: alpha per palette entry (missing entries default 255)
        got_a = _png_decode(self._png(
            ihdr, raw, extra=self._chunk(b"PLTE", plte)
            + self._chunk(b"tRNS", bytes([10, 200]))))
        assert got_a.shape == (2, 4, 4)
        assert np.array_equal(got_a[..., :3], want)
        assert got_a[..., 3].tolist() == [[10, 200, 255, 255],
                                          [255, 255, 200, 10]]

    def test_16bit_png_returns_uint16(self):
        from astra_perseverance_spark.extensions.multimodal import _png_decode

        px = np.array([[1, 65535, 4096], [300, 0, 2]], dtype=np.uint16)
        raw = b"".join(bytes([0]) + row.astype(">u2").tobytes()
                       for row in px)
        ihdr = struct.pack(">IIBBBBB", 3, 2, 16, 0, 0, 0, 0)
        got = _png_decode(self._png(ihdr, raw))
        assert got.dtype == np.uint16
        assert np.array_equal(got.reshape(2, 3), px)

    def test_depth4_grey_png_scales_to_8bit(self):
        from astra_perseverance_spark.extensions.multimodal import _png_decode

        # 5 px wide at 4 bits: 2.5 bytes → 3 bytes with pad bits
        rows = [[0, 15, 8, 1, 7], [15, 0, 3, 12, 5]]
        raw = b""
        for r in rows:
            packed = bytearray()
            for i in range(0, 6, 2):
                hi = r[i] if i < 5 else 0
                lo = r[i + 1] if i + 1 < 5 else 0
                packed.append((hi << 4) | lo)
            raw += bytes([0]) + bytes(packed)
        ihdr = struct.pack(">IIBBBBB", 5, 2, 4, 0, 0, 0, 0)
        got = _png_decode(self._png(ihdr, raw))
        want = (np.array(rows, dtype=np.uint8) * 17).reshape(2, 5, 1)
        assert np.array_equal(got, want)  # 255 // 15 == 17

    def test_adam7_interlaced_png(self):
        from astra_perseverance_spark.extensions.multimodal import _png_decode

        ADAM7 = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
                 (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
        rng = np.random.default_rng(21)
        for h, w in ((9, 10), (8, 8), (3, 5), (1, 1), (2, 9)):
            px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
            raw = b""
            for x0, y0, dx, dy in ADAM7:
                sub = px[y0::dy, x0::dx]
                if sub.size == 0:
                    continue
                for row in sub:
                    raw += bytes([0]) + row.astype(np.uint8).tobytes()
            ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1)
            got = _png_decode(self._png(ihdr, raw))
            assert np.array_equal(got, px), (h, w)

    def test_wav_24bit_sign_extension(self):
        from astra_perseverance_spark.extensions.multimodal import _wav_decode

        vals = np.array([[0], [1], [-1], [8_388_607], [-8_388_608],
                         [-42]], dtype=np.int32)
        buf = io.BytesIO()
        with wave.open(buf, "wb") as f:
            f.setnchannels(1)
            f.setsampwidth(3)
            f.setframerate(8000)
            le = vals.astype("<i4").tobytes()
            f.writeframes(b"".join(le[i:i + 3] for i in range(0, len(le), 4)))
        got = _wav_decode(buf.getvalue())
        assert got.dtype == np.int32
        assert np.array_equal(got, vals)

    def test_wav_32bit_pcm(self):
        from astra_perseverance_spark.extensions.multimodal import _wav_decode

        vals = np.array([[2_000_000_000, -2_000_000_000],
                         [0, -1]], dtype=np.int32)
        buf = io.BytesIO()
        with wave.open(buf, "wb") as f:
            f.setnchannels(2)
            f.setsampwidth(4)
            f.setframerate(8000)
            f.writeframes(vals.astype("<i4").tobytes())
        got = _wav_decode(buf.getvalue())
        assert got.dtype == np.int32 and np.array_equal(got, vals)

    def test_unsupported_combinations_still_declared(self):
        from astra_perseverance_spark.extensions.multimodal import _png_decode

        # 16-bit palette is illegal per spec; depth-2 RGB unsupported
        for depth, color in ((16, 3), (2, 2)):
            ihdr = struct.pack(">IIBBBBB", 2, 2, depth, color, 0, 0, 0)
            with pytest.raises(NotImplementedError):
                _png_decode(self._png(ihdr, b"\x00\x00\x00"))


class TestTruncationGuards:
    """Round-11 review findings: truncated container headers must
    surface through the malformed-payload ValueError convention,
    never a raw struct.error."""

    def test_truncated_avih_raises_valueerror(self):
        import struct as st

        from astra_perseverance_spark.extensions.multimodal import (
            _avi_probe,
        )

        # avih chunk declaring/carrying only 20 body bytes
        short = b"avih" + st.pack("<I", 20) + b"\x00" * 20
        hdrl = b"LIST" + st.pack("<I", 4 + len(short)) + b"hdrl" + short
        body = b"AVI " + hdrl
        avi = b"RIFF" + st.pack("<I", len(body)) + body
        with pytest.raises(ValueError, match="avih"):
            _avi_probe(avi)

    def test_truncated_png_ihdr_raises_valueerror(self):
        from astra_perseverance_spark.extensions.multimodal import (
            _png_decode,
        )

        def chunk(ctype, data):
            return (struct.pack(">I", len(data)) + ctype + data
                    + struct.pack(">I", zlib.crc32(ctype + data)))

        png = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", struct.pack(">II", 2, 2))  # 8 < 13 bytes
               + chunk(b"IEND", b""))
        with pytest.raises(ValueError, match="IHDR"):
            _png_decode(png)


class TestLibraryFailureFallback:
    """decode_media's tiers fall back on library FAILURE, not only
    absence — an installed Pillow that rejects a payload the builtin
    codecs decode (12-bit JPEG; PyAV vs the minimal AVI) must not
    regress the dependency-free surface."""

    def test_image_falls_back_when_library_path_fails(self, monkeypatch):
        import sys
        import types

        from astra_perseverance_spark.extensions import multimodal

        fake_pil = types.ModuleType("PIL")
        fake_image = types.ModuleType("PIL.Image")

        def _boom(_fh):
            raise OSError("unsupported 12-bit stream")

        fake_image.open = _boom
        fake_pil.Image = fake_image
        monkeypatch.setitem(sys.modules, "PIL", fake_pil)
        monkeypatch.setitem(sys.modules, "PIL.Image", fake_image)
        jpeg = _mk_real_jpeg(8, 8)
        got = multimodal.decode_media(jpeg, "image")
        assert got.shape[:2] == (8, 8)

    def test_video_falls_back_when_library_path_fails(self, monkeypatch):
        import sys
        import types

        from astra_perseverance_spark.extensions import multimodal

        fake_av = types.ModuleType("av")

        def _boom(_fh):
            raise ValueError("InvalidDataError: no strl LIST")

        fake_av.open = _boom
        monkeypatch.setitem(sys.modules, "av", fake_av)
        frames = [_mk_real_jpeg(8, 8)] * 2
        avi = _mk_mjpeg_avi(frames, 8, 8)
        got = multimodal.decode_media(avi, "video")
        assert got.shape[0] == 2 and got.shape[1:3] == (8, 8)


def _mk_real_jpeg(h: int, w: int) -> bytes:
    """A decodable JPEG (the header-only _mk_jpeg has fake entropy)."""
    import numpy as _np

    from astra_perseverance_spark.extensions.jpegcodec import (
        encode_baseline_jpeg,
    )

    return encode_baseline_jpeg(
        _np.full((h, w), 128, dtype=_np.uint8))
