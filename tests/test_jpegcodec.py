"""Roundtrip and structure tests for the built-in baseline JPEG codec
(``extensions.jpegcodec``) — no external codec needed: the encoder
writes legal baseline streams, the decoder reads them back, and the
error bound is the flat quantization table's.

When Pillow happens to be importable the decoder is additionally
cross-checked against it on the same encoded bytes (a genuinely
independent implementation of the same public spec)."""

from __future__ import annotations

import numpy as np
import pytest

from astra_perseverance_spark.extensions.jpegcodec import (
    decode_baseline_jpeg,
    encode_baseline_jpeg,
)


def _gradient(h, w, seed=0):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([
        (yy * (3 + seed)) % 256,
        (xx * (2 + seed)) % 256,
        ((yy + xx) * 2) % 256,
    ], -1).astype(np.uint8)


class TestRoundtrip:
    def test_flat_color_near_exact(self):
        img = np.full((16, 24, 3), [120, 60, 200], dtype=np.uint8)
        dec = decode_baseline_jpeg(encode_baseline_jpeg(img))
        assert dec.shape == img.shape and dec.dtype == np.uint8
        assert np.abs(dec.astype(int) - img.astype(int)).max() <= 2

    @pytest.mark.parametrize("subsample", [1, 2])
    @pytest.mark.parametrize("restart", [0, 3])
    def test_gradient_all_modes(self, subsample, restart):
        """Odd (non-multiple-of-MCU) dims × 4:4:4 / 4:2:0 × with and
        without restart markers."""
        img = _gradient(33, 41)
        enc = encode_baseline_jpeg(img, subsample=subsample,
                                   restart_interval=restart)
        dec = decode_baseline_jpeg(enc)
        assert dec.shape == img.shape
        err = np.abs(dec.astype(int) - img.astype(int))
        assert err.mean() < 3 and err.max() <= 12, (subsample, restart)

    def test_grayscale(self):
        yy, xx = np.mgrid[0:33, 0:41]
        g = ((yy * 5 + xx * 3) % 256).astype(np.uint8)
        dec = decode_baseline_jpeg(encode_baseline_jpeg(g))
        assert dec.shape == g.shape and dec.ndim == 2
        assert np.abs(dec.astype(int) - g.astype(int)).mean() < 3

    def test_noise_bounded_by_quantizer(self):
        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (24, 24, 3)).astype(np.uint8)
        dec = decode_baseline_jpeg(encode_baseline_jpeg(img))
        err = np.abs(dec.astype(int) - img.astype(int))
        # flat q=8/12 tables: worst-case error stays far from gross
        assert err.mean() < 8 and err.max() < 48

    def test_restart_dc_reset_matters(self):
        """The restart stream really exercises the reset path: the
        same image with restart_interval=1 still roundtrips (every
        MCU re-seeds DC prediction and the bit reader re-aligns)."""
        img = _gradient(17, 26, seed=2)
        dec = decode_baseline_jpeg(
            encode_baseline_jpeg(img, restart_interval=1))
        assert np.abs(dec.astype(int) - img.astype(int)).mean() < 3


class TestStructure:
    def test_dims_match_jpeg_dims_walker(self):
        from astra_perseverance_spark.extensions.multimodal import _jpeg_dims

        enc = encode_baseline_jpeg(_gradient(21, 34))
        assert _jpeg_dims(enc) == (21, 34)

    def test_rejects_non_jpeg(self):
        with pytest.raises(ValueError):
            decode_baseline_jpeg(b"APSE not jpeg")

    def test_truncated_entropy_raises(self):
        enc = encode_baseline_jpeg(_gradient(16, 16))
        with pytest.raises(ValueError):
            decode_baseline_jpeg(enc[: len(enc) // 2])

    def test_sof2_rewrite_of_baseline_scan_rejected(self):
        """Flipping a baseline stream's SOF0 marker to SOF2 leaves a
        full-spectrum (Ss=0, Se=63) scan header, which is illegal in
        progressive mode (a DC scan must have Se=0) — a codec error,
        never garbage pixels.  (Until round 10 ALL of SOF2 raised
        NotImplementedError; real progressive streams now decode —
        see TestProgressive.)"""
        enc = bytearray(encode_baseline_jpeg(_gradient(16, 16)))
        sof = enc.find(b"\xff\xc0")
        enc[sof + 1] = 0xC2  # rewrite SOF0 → SOF2 (progressive)
        with pytest.raises(ValueError):
            decode_baseline_jpeg(bytes(enc))

    def test_arithmetic_marker_raises_not_implemented(self):
        enc = bytearray(encode_baseline_jpeg(_gradient(16, 16)))
        sof = enc.find(b"\xff\xc0")
        enc[sof + 1] = 0xC9  # SOF9: arithmetic-coded sequential
        with pytest.raises(NotImplementedError):
            decode_baseline_jpeg(bytes(enc))

    def test_missing_tables_raise(self):
        """The header-only fixture JPEG (valid SOF, no DQT, fake
        entropy) is a codec error, never garbage pixels — missing DHT
        now falls back to the Annex K defaults, but a missing
        quantization table has no implied default."""
        from tests.test_multimodal import _mk_jpeg

        with pytest.raises(ValueError):
            decode_baseline_jpeg(_mk_jpeg(8, 8))

    def test_missing_dqt_raises_valueerror_not_keyerror(self):
        """A stream whose SOF references a quantization table no DQT
        segment defined must surface through the codec's ValueError
        convention (like missing DHT), never a raw KeyError at EOI —
        a corrupt MJPEG frame reaches decode_media callers with an
        idiomatic error."""
        enc = bytearray(encode_baseline_jpeg(_gradient(16, 16)))
        # retarget every SOF component's Tq to an undefined table id
        sof = enc.find(b"\xff\xc0")
        ncomp = enc[sof + 9]
        for c in range(ncomp):
            # component c: id at +10+3c, HV at +11+3c, Tq at +12+3c
            enc[sof + 12 + 3 * c] = 3  # Tq=3: never defined by DQT
        with pytest.raises(ValueError, match="DQT"):
            decode_baseline_jpeg(bytes(enc))


class TestAnnexKDefaults:
    """Table-less streams (the OpenDML MJPEG-in-AVI convention: DHT
    omitted, ITU T.81 Annex K tables implied) must decode through the
    built-in defaults."""

    def test_tableless_stream_roundtrips(self):
        import struct

        from astra_perseverance_spark.extensions.jpegcodec import (
            encode_baseline_jpeg,
        )

        rng = np.random.default_rng(7)
        for shape, sub in (((24, 17), 1), ((16, 24, 3), 1),
                           ((21, 13, 3), 2)):
            img = rng.integers(0, 256, shape, dtype=np.uint8)
            data = encode_baseline_jpeg(img, subsample=sub,
                                        default_tables=True)
            # the stream really is table-less: no DHT in the header
            pos, has_dht = 2, False
            while pos + 4 <= len(data):
                m = data[pos + 1]
                if m == 0xDA:
                    break
                (ln,) = struct.unpack(">H", data[pos + 2:pos + 4])
                has_dht = has_dht or m == 0xC4
                pos += 2 + ln
            assert not has_dht
            out = decode_baseline_jpeg(data)
            ref = decode_baseline_jpeg(
                encode_baseline_jpeg(img, subsample=sub))
            # same quantized coefficients either way — the table
            # choice is pure entropy coding and must not move a pixel
            assert out.shape == img.shape
            assert np.abs(out.astype(int) - ref.astype(int)).max() <= 1

    def test_tables_match_published_spec_lengths(self):
        """Cross-check the transcription against independently known
        facts from the spec: value counts, value uniqueness, and the
        published code lengths of the structurally important symbols
        (EOB / ZRL / DC size 0)."""
        from astra_perseverance_spark.extensions.jpegcodec import (
            _DEFAULT_HUFF,
            _K_AC_CHROMA_VALS,
            _K_AC_LUMA_VALS,
        )

        assert len(_K_AC_LUMA_VALS) == len(set(_K_AC_LUMA_VALS)) == 162
        assert len(_K_AC_CHROMA_VALS) == len(set(_K_AC_CHROMA_VALS)) == 162
        # every (run 0-15, size 1-10) pair plus EOB and ZRL is codable
        want = {0x00, 0xF0} | {(r << 4) | s
                               for r in range(16) for s in range(1, 11)}
        assert set(_K_AC_LUMA_VALS) == want
        assert set(_K_AC_CHROMA_VALS) == want
        lengths = {k: {v: ln for (ln, _c), v in t.items()}
                   for k, t in _DEFAULT_HUFF.items()}
        assert lengths[(1, 0)][0x00] == 4    # AC luma EOB
        assert lengths[(1, 0)][0xF0] == 11   # AC luma ZRL
        assert lengths[(1, 1)][0x00] == 2    # AC chroma EOB
        assert lengths[(1, 1)][0xF0] == 10   # AC chroma ZRL
        assert lengths[(0, 0)][0] == 2       # DC luma size-0
        assert set(lengths[(0, 0)]) == set(range(12))
        assert set(lengths[(0, 1)]) == set(range(12))


class TestProgressive:
    """Progressive (SOF2) decode — spectral selection + successive
    approximation per ITU T.81 Annex G, roundtripped against the
    built-in progressive encoder.  The strong assertion: the
    progressive encoder quantizes with the SAME tables and forward
    path as the baseline encoder, so the decoded pixels of the two
    encodings of one image must be EXACTLY equal — any drift in the
    multi-scan coefficient accumulation (DC bit completion, EOB runs,
    AC correction bits) breaks bit-equality long before it breaks a
    tolerance check."""

    @pytest.mark.parametrize("subsample", [1, 2])
    @pytest.mark.parametrize("restart", [0, 3])
    def test_matches_baseline_decode_exactly(self, subsample, restart):
        from astra_perseverance_spark.extensions.jpegcodec import (
            encode_progressive_jpeg,
        )

        img = _gradient(33, 41)
        base = decode_baseline_jpeg(
            encode_baseline_jpeg(img, subsample=subsample,
                                 restart_interval=restart))
        prog = decode_baseline_jpeg(
            encode_progressive_jpeg(img, subsample=subsample,
                                    restart_interval=restart))
        assert prog.shape == img.shape
        assert np.array_equal(prog, base), (subsample, restart)
        err = np.abs(prog.astype(int) - img.astype(int))
        assert err.mean() < 3, (subsample, restart)

    def test_noise_exercises_refinement_paths(self):
        """Random pixels populate every band with coefficients whose
        magnitudes straddle the Al=1 point transform — newly-nonzero
        positioning, correction bits, ZRL-in-refinement, and EOB
        folds all fire (and must still be bit-exact vs baseline)."""
        from astra_perseverance_spark.extensions.jpegcodec import (
            encode_progressive_jpeg,
        )

        rng = np.random.default_rng(11)
        for shape, sub, rst in (((24, 24, 3), 1, 0), ((21, 13, 3), 2, 2),
                                ((16, 24, 3), 1, 1)):
            img = rng.integers(0, 256, shape, dtype=np.uint8)
            base = decode_baseline_jpeg(
                encode_baseline_jpeg(img, subsample=sub,
                                     restart_interval=rst))
            prog = decode_baseline_jpeg(
                encode_progressive_jpeg(img, subsample=sub,
                                        restart_interval=rst))
            assert np.array_equal(prog, base), (shape, sub, rst)

    def test_grayscale_progressive(self):
        from astra_perseverance_spark.extensions.jpegcodec import (
            encode_progressive_jpeg,
        )

        yy, xx = np.mgrid[0:17, 0:26]
        g = ((yy * 5 + xx * 3) % 256).astype(np.uint8)
        prog = decode_baseline_jpeg(encode_progressive_jpeg(g))
        base = decode_baseline_jpeg(encode_baseline_jpeg(g))
        assert prog.ndim == 2 and np.array_equal(prog, base)

    def test_stream_is_really_progressive_and_multi_scan(self):
        import struct

        from astra_perseverance_spark.extensions.jpegcodec import (
            encode_progressive_jpeg,
        )

        data = encode_progressive_jpeg(_gradient(16, 16))
        assert b"\xff\xc2" in data and b"\xff\xc0" not in data
        # count SOS markers via a marker walk (entropy data can
        # contain FF DA only behind a stuffed FF 00, so a raw scan
        # overcounts; walk segments up to the first SOS instead)
        n_sos = data.count(b"\xff\xda")
        # 1 DC first + 3 comps × 2 bands AC first + 1 DC refine +
        # 3 × 2 AC refine = 14 scans
        assert n_sos >= 14, n_sos
        (h, w) = struct.unpack(">HH", data[data.find(b"\xff\xc2") + 5:
                                           data.find(b"\xff\xc2") + 9])
        assert (h, w) == (16, 16)

    def test_dims_walker_reads_progressive_sof(self):
        from astra_perseverance_spark.extensions.jpegcodec import (
            encode_progressive_jpeg,
        )
        from astra_perseverance_spark.extensions.multimodal import (
            _jpeg_dims,
        )

        assert _jpeg_dims(encode_progressive_jpeg(_gradient(21, 34))) \
            == (21, 34)

    def test_truncated_progressive_raises(self):
        from astra_perseverance_spark.extensions.jpegcodec import (
            encode_progressive_jpeg,
        )

        enc = encode_progressive_jpeg(_gradient(16, 16))
        with pytest.raises(ValueError):
            decode_baseline_jpeg(enc[: len(enc) // 2])


class Test12Bit:
    """12-bit precision (round 10): extended sequential (SOF1 —
    baseline is 8-bit by definition, B.2.2) and progressive frames,
    level shift 2048, widened DC/AC symbol alphabets, uint16 out."""

    def test_sequential_roundtrip_gray_and_rgb(self):
        from astra_perseverance_spark.extensions.jpegcodec import (
            encode_baseline_jpeg,
        )

        yy, xx = np.mgrid[0:33, 0:41]
        g = ((yy * 97 + xx * 61) % 4096).astype(np.uint16)
        dec = decode_baseline_jpeg(encode_baseline_jpeg(g, precision=12))
        assert dec.dtype == np.uint16 and dec.shape == g.shape
        # flat q=8: absolute coefficient error is precision-
        # independent, so the pixel bound stays single-digit
        assert np.abs(dec.astype(int) - g.astype(int)).max() <= 16
        rgb = np.stack([g, (g * 3) % 4096, 4095 - g], -1).astype(np.uint16)
        dec3 = decode_baseline_jpeg(
            encode_baseline_jpeg(rgb, precision=12))
        assert dec3.dtype == np.uint16 and dec3.shape == rgb.shape
        err = np.abs(dec3.astype(int) - rgb.astype(int))
        assert err.mean() < 32, err.mean()

    def test_progressive_matches_sequential_exactly(self):
        from astra_perseverance_spark.extensions.jpegcodec import (
            encode_progressive_jpeg,
        )

        rng = np.random.default_rng(9)
        for shape, sub, rst in (((24, 24, 3), 1, 2), ((17, 26), 1, 0),
                                ((21, 13, 3), 2, 3)):
            img = rng.integers(0, 4096, shape).astype(np.uint16)
            seq = decode_baseline_jpeg(
                encode_baseline_jpeg(img, subsample=sub,
                                     restart_interval=rst, precision=12))
            prog = decode_baseline_jpeg(
                encode_progressive_jpeg(img, subsample=sub,
                                        restart_interval=rst,
                                        precision=12))
            assert np.array_equal(seq, prog), (shape, sub, rst)

    def test_12bit_stream_is_sof1_never_sof0(self):
        from astra_perseverance_spark.extensions.jpegcodec import (
            encode_baseline_jpeg,
        )

        g = (np.mgrid[0:16, 0:16][0] * 100 % 4096).astype(np.uint16)
        data = encode_baseline_jpeg(g, precision=12)
        assert b"\xff\xc1" in data and b"\xff\xc0" not in data
        # and a hand-built SOF0 12-bit stream is rejected as illegal
        bad = bytearray(data)
        bad[bad.find(b"\xff\xc1") + 1] = 0xC0
        with pytest.raises(ValueError):
            decode_baseline_jpeg(bytes(bad))

    def test_default_tables_rejected_at_12_bits(self):
        from astra_perseverance_spark.extensions.jpegcodec import (
            encode_baseline_jpeg,
        )

        g = np.zeros((8, 8), dtype=np.uint16)
        with pytest.raises(ValueError):
            encode_baseline_jpeg(g, precision=12, default_tables=True)


class TestAgainstPillow:
    def test_pillow_crosscheck_if_available(self):
        try:
            from PIL import Image
        except ImportError:
            pytest.skip("Pillow not installed")
        import io

        img = _gradient(32, 32)
        enc = encode_baseline_jpeg(img)
        ours = decode_baseline_jpeg(enc)
        theirs = np.asarray(Image.open(io.BytesIO(enc)).convert("RGB"))
        assert np.abs(ours.astype(int) - theirs.astype(int)).max() <= 2


class TestComponentCountGuard:
    """Round-10 review finding (narrowed in round 11 by the CMYK
    decode): a 2-component oddity must raise the declared error
    instead of a bare IndexError — 4-component frames now decode."""

    def test_two_component_frame_declared(self):
        from astra_perseverance_spark.extensions.jpegcodec import (
            _Q_LUMA, _finish,
        )

        comps = [{"id": i + 1, "h": 1, "v": 1, "tq": 0, "nbw_mcu": 1,
                  "nbh_mcu": 1, "nbw": 1, "nbh": 1} for i in range(2)]
        frame = {"h": 8, "w": 8, "comps": comps, "prec": 8,
                 "hmax": 1, "vmax": 1, "mcu_cols": 1, "mcu_rows": 1}
        coeffs = {c["id"]: np.zeros((1, 1, 64), dtype=np.int32)
                  for c in comps}
        with pytest.raises(NotImplementedError):
            _finish(frame, {0: _Q_LUMA}, coeffs)


class TestAdobeCmyk:
    """Round-11: Adobe 4-component decode (APP14 transform flag,
    T.872 §6.1).  Inputs are the Adobe INVERTED ink convention; the
    decoder composites on white to (h, w, 3) RGB: R = C'·K'/maxval."""

    @staticmethod
    def _cmyk(h, w):
        # flat planes: near-exact through the flat-quantizer roundtrip
        a = np.zeros((h, w, 4), dtype=np.uint8)
        a[..., 0], a[..., 1], a[..., 2], a[..., 3] = 200, 150, 100, 250
        return a

    def _expected_rgb(self, a):
        return (a[..., :3].astype(float)
                * (a[..., 3:].astype(float) / 255.0))

    def test_cmyk_transform0_roundtrip(self):
        a = self._cmyk(24, 16)
        enc = encode_baseline_jpeg(a)
        assert b"Adobe" in enc
        dec = decode_baseline_jpeg(enc)
        assert dec.shape == (24, 16, 3)
        err = np.abs(dec.astype(float) - self._expected_rgb(a)).max()
        assert err <= 2, err

    def test_ycck_transform2_roundtrip(self):
        a = self._cmyk(24, 16)
        enc = encode_baseline_jpeg(a, ycck=True)
        dec = decode_baseline_jpeg(enc)
        err = np.abs(dec.astype(float) - self._expected_rgb(a)).max()
        assert err <= 3, err

    def test_ycck_and_cmyk_agree(self):
        """transform 2 is an invertible re-encoding of the same inks —
        both layouts must decode to the same RGB (up to rounding)."""
        rng = np.random.default_rng(11)
        a = (rng.integers(60, 196, size=(16, 16, 4))
             .astype(np.uint8))
        d0 = decode_baseline_jpeg(encode_baseline_jpeg(a))
        d2 = decode_baseline_jpeg(encode_baseline_jpeg(a, ycck=True))
        assert np.abs(d0.astype(int) - d2.astype(int)).max() <= 12

    def test_cmyk_without_app14_decodes_as_cmyk(self):
        """Marker stripped: 4 components default to plain CMYK (the
        libjpeg convention for unknown transform)."""
        a = self._cmyk(16, 16)
        enc = bytearray(encode_baseline_jpeg(a))
        i = enc.find(b"\xff\xee")
        (seglen,) = __import__("struct").unpack(
            ">H", bytes(enc[i + 2:i + 4]))
        del enc[i:i + 2 + seglen]
        dec = decode_baseline_jpeg(bytes(enc))
        err = np.abs(dec.astype(float) - self._expected_rgb(a)).max()
        assert err <= 2, err

    def test_pillow_crosscheck_if_available(self):
        try:
            from PIL import Image
        except ImportError:
            pytest.skip("Pillow not installed")
        import io

        a = self._cmyk(16, 16)
        enc = encode_baseline_jpeg(a)
        ours = decode_baseline_jpeg(enc)
        theirs = np.asarray(
            Image.open(io.BytesIO(enc)).convert("RGB"))
        assert np.abs(ours.astype(int) - theirs.astype(int)).max() <= 3

    def test_adobe_rgb_transform0_on_three_components(self):
        """Round-11 review finding: APP14 transform 0 on a THREE
        component frame means raw R,G,B planes (T.872 §6.5.3) — the
        decoder must not run them through the YCbCr matrix.  The flag
        is load-bearing: the same stream with APP14 stripped decodes
        scrambled."""
        import struct

        a = _gradient(16, 16)
        enc = encode_baseline_jpeg(a, adobe_rgb=True)
        assert b"Adobe" in enc
        dec = decode_baseline_jpeg(enc)
        err = np.abs(dec.astype(int) - a.astype(int)).max()
        assert err <= 2, err
        # strip APP14: planes get misread as YCbCr -> scrambled
        raw = bytearray(enc)
        i = raw.find(b"\xff\xee")
        (seglen,) = struct.unpack(">H", bytes(raw[i + 2:i + 4]))
        del raw[i:i + 2 + seglen]
        scrambled = decode_baseline_jpeg(bytes(raw))
        assert np.abs(scrambled.astype(int) - a.astype(int)).max() > 16
