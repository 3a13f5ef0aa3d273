"""Pure numpy/stdlib JPEG codec (ITU T.81, public spec): sequential
baseline/extended AND progressive Huffman decode, with roundtrip
encoders for both.

Closes the multimodal decode stubs this container can close without
optional dependencies: ``decode_media``'s MJPEG branch needs
per-frame PIXELS, and Pillow/PyAV are absent here — so the Huffman
DCT paths are implemented directly from the public standard:

- marker walk (reusing the same segment grammar as
  ``multimodal._jpeg_dims``): DQT, DHT, SOF0/1/2, DRI, SOS;
- canonical Huffman table construction from BITS/HUFFVAL (F.2.2.3);
- entropy decode with byte unstuffing (0xFF00) and restart-marker
  handling (DC-prediction reset + bit realignment, F.2.1.3.1);
- DC prediction + AC run-length, EXTEND sign recovery (F.2.2.1);
- multi-scan coefficient accumulation (round 10): sequential
  interleaved AND non-interleaved scans, progressive spectral
  selection and successive approximation — DC first/refine
  (G.1.2.1), AC first with EOBn end-of-band runs (G.1.2.2), AC
  refinement with correction bits (G.1.2.3);
- one vectorized finish: dequantize, inverse zigzag, float IDCT-II
  (separable orthonormal 8×8 matrix — A.3.3), component assembly
  over general H/V sampling factors with nearest-neighbor chroma
  upsampling, JFIF full-range YCbCr→RGB (BT.601).

The encoders exist so the decoder is testable by ROUNDTRIP without
any external codec: legal baseline 4:4:4 / 4:2:0 streams with flat
quantization tables and canonical Huffman tables of their own
construction (any legal DHT is valid — the decoder is
table-agnostic); frames that carry NO tables at all — the common
OpenDML MJPEG-in-AVI convention — decode through the Annex K typical
tables (K.3.3) as the implied default; and a progressive encoder
(``encode_progressive_jpeg``) whose quantized coefficients are
bit-identical to the baseline encoder's, so the tests can assert
EXACT pixel equality between the two decode paths.

12-bit precision (round 10) decodes to uint16 via the same
multi-scan machinery (extended sequential SOF1 and progressive,
level shift 2048, widened symbol alphabets, roundtrip-tested).

Adobe 4-component frames (round 11) decode through the APP14
transform flag: plain CMYK (transform 0 / marker absent) and YCCK
(transform 2) composite to RGB per ITU-T T.872 §6.1 with the Adobe
inverted-ink convention — roundtrip-tested against a 4-channel
encoder mode that emits the APP14 marker.

Deliberately NOT supported — a WONTFIX, not a TODO: arithmetic-coded
streams (SOF9/10, declared NotImplementedError).  Arithmetic coding
was patent-encumbered through the format's entire adoption window,
so encoders essentially never emit it (libjpeg shipped decode-only
support late and off by default); a Huffman-only decoder covers the
JPEGs that exist in the wild, and implementing the QM-coder here
would be hundreds of lines guarding against a corpus that is
effectively empty.  Lossless/hierarchical modes (SOF3/5-7/11/13-15)
are equally absent from real corpora and equally declared.
"""

from __future__ import annotations

import struct

import numpy as np

_SOI = 0xD8
_EOI = 0xD9
_SOS = 0xDA
_DQT = 0xDB
_DHT = 0xC4
_DRI = 0xDD
_SOF0 = 0xC0  # baseline sequential DCT
_SOF1 = 0xC1  # extended sequential (same entropy layout, 8-bit OK)
_SOF2 = 0xC2  # progressive DCT, Huffman (Annex G)
_UNSUPPORTED_SOF = {0xC3, 0xC5, 0xC6, 0xC7,
                    0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def _zigzag_positions() -> list[tuple[int, int]]:
    """(row, col) pairs in JPEG zigzag scan order (A.3.6)."""
    pos = []
    for s in range(15):
        if s % 2 == 0:
            rows = range(min(s, 7), max(0, s - 7) - 1, -1)
        else:
            rows = range(max(0, s - 7), min(s, 7) + 1)
        pos.extend((r, s - r) for r in rows)
    return pos


_ZIGZAG = _zigzag_positions()

# orthonormal 8-point DCT-II matrix: spatial = C.T @ coeffs @ C
_C = np.array([
    [(np.sqrt(0.125) if k == 0 else 0.5)
     * np.cos((2 * n + 1) * k * np.pi / 16.0) for n in range(8)]
    for k in range(8)
])


def _build_huffman(bits: list[int], vals: bytes) -> dict:
    """(length, code) → symbol, canonical construction (C.2)."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """MSB-first reader over an unstuffed entropy interval."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy stream truncated")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table: dict) -> int:
        length, code = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    """EXTEND (F.2.2.1): recover the signed value from s magnitude bits."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


# --- Annex K "typical" Huffman tables (ITU T.81 K.3.3) ----------------
# MJPEG-in-AVI frames very often OMIT DHT segments entirely (the
# OpenDML convention: the standard tables are implied), so a
# table-agnostic decoder still needs these as the fallback when a scan
# references a table id no DHT defined.  Transcribed from the public
# spec; structural invariants (value counts, the spec's published code
# lengths for EOB/ZRL) are pinned in tests/test_jpegcodec.py.

_K_DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_K_DC_LUMA_VALS = bytes(range(12))
_K_DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_K_DC_CHROMA_VALS = bytes(range(12))
_K_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_K_AC_LUMA_VALS = bytes([
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
])
_K_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_K_AC_CHROMA_VALS = bytes([
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
])

_ANNEX_K = {
    (0, 0): (_K_DC_LUMA_BITS, _K_DC_LUMA_VALS),
    (0, 1): (_K_DC_CHROMA_BITS, _K_DC_CHROMA_VALS),
    (1, 0): (_K_AC_LUMA_BITS, _K_AC_LUMA_VALS),
    (1, 1): (_K_AC_CHROMA_BITS, _K_AC_CHROMA_VALS),
}
_DEFAULT_HUFF = {k: _build_huffman(b, v) for k, (b, v) in _ANNEX_K.items()}


def _entropy_intervals(data: bytes, start: int):
    """Split the scan's entropy data into restart intervals, each
    unstuffed (FF00 → FF); returns (intervals, pos_after_scan)."""
    intervals, cur, pos, n = [], bytearray(), start, len(data)
    while pos < n:
        b = data[pos]
        if b != 0xFF:
            cur.append(b)
            pos += 1
            continue
        # 0xFF: look past fill bytes at the marker code
        nxt = pos + 1
        while nxt < n and data[nxt] == 0xFF:
            nxt += 1
        if nxt >= n:
            break
        m = data[nxt]
        if m == 0x00:
            cur.append(0xFF)
            pos = nxt + 1
        elif 0xD0 <= m <= 0xD7:  # RSTn
            intervals.append(bytes(cur))
            cur = bytearray()
            pos = nxt + 1
        else:  # EOI or next marker — scan over
            break
    intervals.append(bytes(cur))
    return intervals, pos


def decode_baseline_jpeg(data: bytes) -> np.ndarray:
    """Decode a sequential (SOF0/SOF1) or progressive (SOF2) Huffman
    JPEG to a (h, w) grayscale or (h, w, 3) RGB uint8 array.

    The name is historical (round 8 shipped the baseline path; round
    10 added multi-scan decode): coefficients accumulate across scans
    into per-component block arrays — sequential interleaved and
    non-interleaved scans, progressive spectral selection (Ss..Se
    bands) and successive approximation (DC first/refine per G.1.2.1,
    AC first with EOBRUN per G.1.2.2, AC refinement with correction
    bits per G.1.2.3) — and one vectorized dequantize + IDCT pass at
    EOI materializes pixels.  Restart intervals reset DC prediction
    and the EOB run in every scan kind.  8-bit frames return uint8,
    12-bit frames uint16.  Still declared unsupported (arithmetic
    coding, lossless/hierarchical): NotImplementedError."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart = 0
    coeffs: dict[int, np.ndarray] = {}
    scanned = False
    adobe_transform = None
    pos, n = 2, len(data)
    while pos + 2 <= n:
        if data[pos] != 0xFF:
            raise ValueError("bad JPEG marker stream")
        while pos + 1 < n and data[pos + 1] == 0xFF:
            pos += 1
        if pos + 2 > n:
            break
        marker = data[pos + 1]
        pos += 2
        if marker == 0x01 or 0xD0 <= marker <= 0xD8:
            continue
        if marker == _EOI:
            break
        if pos + 2 > n:
            raise ValueError("truncated JPEG segment")
        (seglen,) = struct.unpack(">H", data[pos:pos + 2])
        body = data[pos + 2:pos + seglen]
        if marker in _UNSUPPORTED_SOF:
            raise NotImplementedError(
                "only sequential/progressive Huffman JPEG is supported "
                "(arithmetic/lossless/hierarchical need Pillow)")
        if marker == _DQT:
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0xF
                i += 1
                width = 128 if pq else 64
                if i + width > len(body):
                    raise ValueError("truncated JPEG DQT segment")
                if pq:  # 16-bit table
                    vals = np.frombuffer(
                        body[i:i + 128], dtype=">u2").astype(np.int32)
                    i += 128
                else:
                    vals = np.frombuffer(
                        body[i:i + 64], dtype=np.uint8).astype(np.int32)
                    i += 64
                t = np.zeros((8, 8), dtype=np.int32)
                for z, (r, c) in enumerate(_ZIGZAG):
                    t[r, c] = vals[z]
                qt[tq] = t
        elif marker == _DHT:
            i = 0
            while i < len(body):
                if i + 17 > len(body):
                    raise ValueError("truncated JPEG DHT segment")
                tc, th = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1:i + 17])
                nvals = sum(bits)
                vals = body[i + 17:i + 17 + nvals]
                if len(vals) < nvals:
                    raise ValueError("truncated JPEG DHT segment")
                huff[(tc, th)] = _build_huffman(bits, vals)
                i += 17 + nvals
        elif marker in (_SOF0, _SOF1, _SOF2):
            if len(body) < 6:
                raise ValueError("truncated JPEG SOF segment")
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec not in (8, 12):
                raise NotImplementedError(
                    f"unsupported JPEG sample precision {prec}")
            if prec == 12 and marker == _SOF0:
                raise ValueError("baseline JPEG must be 8-bit (B.2.2)")
            if len(body) < 6 + 3 * nc:
                raise ValueError("truncated JPEG SOF segment")
            comps = []
            for ci in range(nc):
                cid, hv, tq = struct.unpack(
                    ">BBB", body[6 + 3 * ci:9 + 3 * ci])
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "tq": tq})
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            if any(hmax % c["h"] or vmax % c["v"] for c in comps):
                raise NotImplementedError(
                    "non-integer JPEG sampling ratios need Pillow")
            mcu_cols = -(-w // (8 * hmax))
            mcu_rows = -(-h // (8 * vmax))
            for c in comps:
                # interleaved (MCU-padded) block grid, and the
                # non-interleaved grid over the component's own
                # sample dimensions (T.81 A.2.2)
                c["nbw_mcu"] = mcu_cols * c["h"]
                c["nbh_mcu"] = mcu_rows * c["v"]
                comp_w = -(-w * c["h"] // hmax)
                comp_h = -(-h * c["v"] // vmax)
                c["nbw"] = -(-comp_w // 8)
                c["nbh"] = -(-comp_h // 8)
            frame = {"h": h, "w": w, "comps": comps, "prec": prec,
                     "hmax": hmax, "vmax": vmax,
                     "mcu_cols": mcu_cols, "mcu_rows": mcu_rows,
                     "progressive": marker == _SOF2}
            coeffs = {
                c["id"]: np.zeros((c["nbh_mcu"], c["nbw_mcu"], 64),
                                  dtype=np.int32)
                for c in comps
            }
        elif marker == 0xEE and body[:5] == b"Adobe" and len(body) >= 12:
            # APP14 Adobe: 'Adobe', version(2), flags0(2), flags1(2),
            # transform(1) — 0 = CMYK/unknown, 1 = YCbCr, 2 = YCCK
            adobe_transform = body[11]
        elif marker == _DRI:
            (restart,) = struct.unpack(">H", body[:2])
        elif marker == _SOS:
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            if not body or len(body) < 4 + 2 * body[0]:
                raise ValueError("truncated JPEG SOS segment")
            ns = body[0]
            scan = []
            for si in range(ns):
                cs, tt = body[1 + 2 * si], body[2 + 2 * si]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append((comp, tt >> 4, tt & 0xF))
            ss, se, ahal = body[1 + 2 * ns:4 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            intervals, pos = _entropy_intervals(data, pos + seglen)
            _decode_scan_into(frame, scan, huff, intervals, restart,
                              coeffs, ss, se, ah, al)
            scanned = True
            continue
        pos += seglen
    if not scanned:
        raise ValueError("JPEG missing SOS/EOI structure")
    frame["adobe_transform"] = adobe_transform
    return _finish(frame, qt, coeffs)


# importable alias — the historical name above is the compatibility
# surface (multimodal.decode_media, tests); this one says what it does
decode_jpeg = decode_baseline_jpeg


def _scan_blocks(frame, scan):
    """Restart-countable decode units: interleaved scans yield one
    MCU's blocks at a time (A.2.3 ordering); a single-component scan
    yields one block at a time in raster order over the component's
    own block grid (A.2.2)."""
    if len(scan) > 1:
        for m in range(frame["mcu_rows"] * frame["mcu_cols"]):
            my, mx = divmod(m, frame["mcu_cols"])
            unit = []
            for comp, tdc, tac in scan:
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        unit.append((comp, tdc, tac,
                                     my * comp["v"] + by,
                                     mx * comp["h"] + bx))
            yield unit
    else:
        comp, tdc, tac = scan[0]
        for by in range(comp["nbh"]):
            for bx in range(comp["nbw"]):
                yield [(comp, tdc, tac, by, bx)]


def _n_units(frame, scan) -> int:
    if len(scan) > 1:
        return frame["mcu_rows"] * frame["mcu_cols"]
    return scan[0][0]["nbh"] * scan[0][0]["nbw"]


def _decode_scan_into(frame, scan, huff, intervals, restart,
                      coeffs, ss, se, ah, al) -> None:
    """Decode one scan's entropy data into the coefficient arrays.

    Sequential frames always carry the full spectrum (the Ss/Se/Ah/Al
    bytes are fixed 0/63/0/0 and ignored here); progressive frames
    dispatch on the spectral-selection / successive-approximation
    header per Annex G."""
    progressive = frame["progressive"]
    if progressive:
        if ss == 0 and se != 0:
            raise ValueError(
                "progressive JPEG scan mixes DC and AC coefficients")
        if ss > 0 and len(scan) != 1:
            raise ValueError(
                "progressive JPEG AC scan must be non-interleaved")
        if ss > 63 or se > 63 or ss > se:
            raise ValueError("bad JPEG spectral selection")
    tables = []
    for comp, tdc, tac in scan:
        # fall back to the Annex K typical tables when the frame
        # carries no DHT for the referenced id — the OpenDML
        # MJPEG-in-AVI convention (frames omit DHT, the standard
        # tables are implied)
        need_dc = (not progressive) or (ss == 0 and ah == 0)
        need_ac = (not progressive) or ss > 0
        dct = huff.get((0, tdc)) or _DEFAULT_HUFF.get((0, tdc))
        act = huff.get((1, tac)) or _DEFAULT_HUFF.get((1, tac))
        if (need_dc and dct is None) or (need_ac and act is None):
            raise ValueError("JPEG scan references missing DHT table")
        tables.append((dct, act))
    tbl = {id(c): t for (c, _d, _a), t in zip(scan, tables)}
    n_units = _n_units(frame, scan)
    per_interval = restart if restart else n_units
    preds = {c["id"]: 0 for c, _d, _a in scan}
    eobrun = 0
    reader = None
    interval_idx = -1
    for u, unit in enumerate(_scan_blocks(frame, scan)):
        if u % per_interval == 0:
            interval_idx += 1
            if interval_idx >= len(intervals):
                raise ValueError("JPEG restart intervals exhausted")
            reader = _BitReader(intervals[interval_idx])
            preds = {c["id"]: 0 for c, _d, _a in scan}
            eobrun = 0
        for comp, _tdc, _tac, by, bx in unit:
            out64 = coeffs[comp["id"]][by, bx]
            dct, act = tbl[id(comp)]
            if not progressive:
                _seq_block(reader, dct, act, comp["id"], preds, out64)
            elif ss == 0 and ah == 0:
                s = reader.read_symbol(dct)
                diff = _extend(reader.read_bits(s), s)
                preds[comp["id"]] += diff
                out64[0] = preds[comp["id"]] << al
            elif ss == 0:
                # DC refinement (G.1.2.1): one appended magnitude bit
                # per block, completing the two's-complement value
                if reader.read_bit():
                    out64[0] |= (1 << al)
            elif ah == 0:
                eobrun = _ac_first_block(
                    reader, act, out64, ss, se, al, eobrun)
            else:
                eobrun = _ac_refine_block(
                    reader, act, out64, ss, se, al, eobrun)


def _seq_block(reader, dct, act, cid, preds, out64) -> None:
    """Full-spectrum sequential block decode (F.2.2) into zigzag
    coefficient storage."""
    s = reader.read_symbol(dct)
    diff = _extend(reader.read_bits(s), s)
    preds[cid] += diff
    out64[0] = preds[cid]
    k = 1
    while k < 64:
        rs = reader.read_symbol(act)
        r, size = rs >> 4, rs & 0xF
        if size == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("JPEG AC index overrun")
        out64[k] = _extend(reader.read_bits(size), size)
        k += 1


def _ac_first_block(reader, act, out64, ss, se, al, eobrun) -> int:
    """First AC scan of a band (G.1.2.2): run-length symbols with
    EOBn end-of-band runs; decoded values arrive at magnitude << Al."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = reader.read_symbol(act)
        r, size = rs >> 4, rs & 0xF
        if size == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += reader.read_bits(r)
            break
        k += r
        if k > se:
            raise ValueError("JPEG AC index overrun")
        out64[k] = _extend(reader.read_bits(size), size) << al
        k += 1
    return eobrun


def _ac_refine_block(reader, act, out64, ss, se, al, eobrun) -> int:
    """AC successive-approximation refinement (G.1.2.3): each symbol
    positions one newly-nonzero ±1<<Al coefficient, and every
    already-nonzero coefficient passed over contributes one
    correction bit that may append 1<<Al to its magnitude."""
    p1 = 1 << al

    def refine(k):
        v = int(out64[k])
        if v and reader.read_bit() and (v & p1) == 0:
            out64[k] = v + (p1 if v >= 0 else -p1)
        return v != 0

    k = ss
    if eobrun == 0:
        while k <= se:
            rs = reader.read_symbol(act)
            r, size = rs >> 4, rs & 0xF
            newval = 0
            if size:
                if size != 1:
                    raise ValueError("invalid JPEG AC refinement symbol")
                newval = p1 if reader.read_bit() else -p1
            elif r != 15:
                eobrun = 1 << r
                if r:
                    eobrun += reader.read_bits(r)
                break
            # advance past r zero-history coefficients (16 for ZRL),
            # refining every nonzero-history coefficient on the way
            while k <= se:
                if not refine(k):
                    r -= 1
                    if r < 0:
                        break
                k += 1
            if newval:
                if k > se:
                    raise ValueError("JPEG AC refinement overrun")
                out64[k] = newval
            k += 1
    if eobrun > 0:
        while k <= se:
            refine(k)
            k += 1
        eobrun -= 1
    return eobrun


_ZZ_FLAT = [r * 8 + c for r, c in _ZIGZAG]


def _finish(frame, qt, coeffs) -> np.ndarray:
    """Dequantize + inverse-zigzag + IDCT every accumulated block and
    assemble components into pixels (one vectorized pass per plane).
    8-bit frames return uint8; 12-bit frames (level shift 2048, range
    0..4095 per A.3.1) return uint16."""
    h, w = frame["h"], frame["w"]
    hmax, vmax = frame["hmax"], frame["vmax"]
    level = 1 << (frame["prec"] - 1)
    vmaxval = (1 << frame["prec"]) - 1
    dtype = np.uint8 if frame["prec"] == 8 else np.uint16
    out = []
    for comp in frame["comps"]:
        # ValueError, not KeyError: a malformed stream (SOF referencing
        # a table no DQT defined) must surface through the codec's
        # ValueError convention, like the missing-DHT path
        q = qt.get(comp["tq"])
        if q is None:
            raise ValueError(
                f"JPEG frame references missing DQT table {comp['tq']}")
        c = coeffs[comp["id"]]
        nat = np.zeros((c.shape[0], c.shape[1], 64), dtype=np.float64)
        nat[:, :, _ZZ_FLAT] = c
        blocks = nat.reshape(c.shape[0], c.shape[1], 8, 8) * q
        spatial = np.einsum("ki,yxkl,lj->yxij", _C, blocks, _C) + level
        plane = spatial.transpose(0, 2, 1, 3).reshape(
            c.shape[0] * 8, c.shape[1] * 8)
        plane = np.repeat(np.repeat(plane, vmax // comp["v"], axis=0),
                          hmax // comp["h"], axis=1)
        out.append(plane[:h, :w])
    if len(out) == 1:
        return np.clip(out[0] + 0.5, 0, vmaxval).astype(dtype)
    if len(out) not in (3, 4):
        # a 2-component frame has no defined color model anywhere
        raise NotImplementedError(
            f"{len(out)}-component JPEG needs Pillow")
    if len(out) == 4:
        # Adobe 4-component frames (ITU-T T.872 §6.1 and the APP14
        # convention libjpeg documents): transform 2 = YCCK (the first
        # three planes are the YCbCr encoding of inverted CMY), 0 or
        # no marker = plain CMYK.  Adobe writers store the ink values
        # INVERTED (x' = maxval − x), so compositing on white reduces
        # to R = C'·K'/maxval per channel; the result is returned as
        # (h, w, 3) RGB like every other color frame — downstream
        # (decode_media feature extraction) consumes pixels, not inks.
        if frame.get("adobe_transform") == 2:
            y, cb, cr = out[0], out[1] - level, out[2] - level
            cmy_inv = _ycc_to_rgb(y, cb, cr)
        else:
            cmy_inv = np.stack(out[:3], axis=-1)
        k_inv = np.clip(out[3], 0, vmaxval)
        rgb = np.clip(cmy_inv, 0, vmaxval) * (k_inv / vmaxval)[..., None]
        return np.clip(rgb + 0.5, 0, vmaxval).astype(dtype)
    if frame.get("adobe_transform") == 0:
        # Adobe APP14 transform 0 on a 3-component frame: the planes
        # are raw R,G,B (T.872 §6.5.3 / the libjpeg convention) —
        # running them through the YCbCr matrix would scramble the
        # channels silently
        return np.clip(
            np.stack(out, axis=-1) + 0.5, 0, vmaxval).astype(dtype)
    y, cb, cr = out[0], out[1] - level, out[2] - level
    return np.clip(_ycc_to_rgb(y, cb, cr) + 0.5, 0, vmaxval).astype(dtype)


def _ycc_to_rgb(y, cb, cr) -> np.ndarray:
    """The T.871 full-range YCbCr→RGB matrix (unclipped float planes
    stacked channel-last) — shared by the 3-component path and the
    YCCK→inverted-CMY step of the Adobe 4-component path."""
    return np.stack([
        y + 1.402 * cr,
        y - 0.344136 * cb - 0.714136 * cr,
        y + 1.772 * cb,
    ], axis=-1)


# --- encoder (tests' roundtrip source; any legal stream is fine) ------

_Q_LUMA = np.full((8, 8), 8, dtype=np.int32)
_Q_CHROMA = np.full((8, 8), 12, dtype=np.int32)

# canonical tables of our own construction (legal, table-agnostic
# decoders read them from DHT): DC symbols 0..11 at 4 bits, AC symbols
# (all 162 legal run/size pairs) at 8 bits — Kraft-satisfying, the
# all-ones code unused in both.
_DC_BITS = [0, 0, 0, 12] + [0] * 12
_DC_VALS = bytes(range(12))
_AC_SYMBOLS = bytes(
    [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 11)])
_AC_BITS = [0, 0, 0, 0, 0, 0, 0, len(_AC_SYMBOLS)] + [0] * 8

# 12-bit precision widens the symbol alphabets (F.1.2.1.1: DC sizes to
# 15, here 0..15; F.1.2.2.1: AC sizes to 14) — 16 DC symbols at 5 bits
# and 226 AC symbols at 8 bits, both Kraft-satisfying with the
# all-ones code unused.
_DC_BITS12 = [0, 0, 0, 0, 16] + [0] * 11
_DC_VALS12 = bytes(range(16))
_AC_SYMBOLS12 = bytes(
    [0x00, 0xF0] + [(r << 4) | s for r in range(16) for s in range(1, 15)])
_AC_BITS12 = [0, 0, 0, 0, 0, 0, 0, len(_AC_SYMBOLS12)] + [0] * 8


def _encode_table(bits: list[int], vals: bytes) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) from the canonical construction."""
    out, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_ENC = _encode_table(_DC_BITS, _DC_VALS)
_AC_ENC = _encode_table(_AC_BITS, _AC_SYMBOLS)
_DC_ENC12 = _encode_table(_DC_BITS12, _DC_VALS12)
_AC_ENC12 = _encode_table(_AC_BITS12, _AC_SYMBOLS12)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-padding per F.1.2.3
        return bytes(self.out)


def _mag(v: int) -> tuple[int, int]:
    """(size, magnitude-bits) for a signed coefficient (F.1.2.1)."""
    if v == 0:
        return 0, 0
    s = int(v).bit_length() if v > 0 else int(-v).bit_length()
    return s, (v if v >= 0 else v + (1 << s) - 1)


def _encode_block(writer: _BitWriter, block: np.ndarray, q: np.ndarray,
                  pred: int, dc_enc=None, ac_enc=None,
                  level: float = 128.0) -> int:
    dc_enc = _DC_ENC if dc_enc is None else dc_enc
    ac_enc = _AC_ENC if ac_enc is None else ac_enc
    coeffs = np.round((_C @ (block - level) @ _C.T) / q).astype(np.int32)
    zz = np.array([coeffs[r, c] for r, c in _ZIGZAG])
    s, mag = _mag(int(zz[0]) - pred)
    code, length = dc_enc[s]
    writer.write(code, length)
    if s:
        writer.write(mag, s)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_enc[0xF0]
            writer.write(c, ln)
            run -= 16
        s, mag = _mag(v)
        c, ln = ac_enc[(run << 4) | s]
        writer.write(c, ln)
        writer.write(mag, s)
        run = 0
    if run:
        c, ln = ac_enc[0x00]
        writer.write(c, ln)
    return int(zz[0])


def _mcu_geometry(arr: np.ndarray, subsample: int, precision: int = 8,
                  ycck: bool = False, adobe_rgb: bool = False):
    """Shared encoder prep: color transform (chroma centered at
    2^(precision−1)), chroma subsampling, and MCU-grid edge padding.
    Returns (gray, h, w, comps, padded) where comps rows are
    (name, plane, h_factor, v_factor, tq).  A 4-channel input is
    Adobe-convention INVERTED CMYK; ``ycck=True`` additionally runs
    the first three planes through the forward YCbCr transform
    (T.872 YCCK).  ``adobe_rgb=True`` stores a 3-channel input as
    raw R,G,B planes (APP14 transform 0 — T.872 §6.5.3)."""
    arr = np.asarray(arr)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    level = float(1 << (precision - 1))
    if gray:
        comps = [("Y", arr.astype(np.float64), 1, 1, 0)]
        subsample = 1
    elif adobe_rgb and arr.shape[-1] == 3:
        a = arr.astype(np.float64)
        comps = [("R", a[..., 0], 1, 1, 0), ("G", a[..., 1], 1, 1, 0),
                 ("B", a[..., 2], 1, 1, 0)]
    elif arr.shape[-1] == 4:
        a = arr.astype(np.float64)
        c, m, ye, k = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
        if ycck:
            y = 0.299 * c + 0.587 * m + 0.114 * ye
            cb = -0.168736 * c - 0.331264 * m + 0.5 * ye + level
            cr = 0.5 * c - 0.418688 * m - 0.081312 * ye + level
            c, m, ye = y, cb, cr
        comps = [("C", c, 1, 1, 0), ("M", m, 1, 1, 0),
                 ("Y", ye, 1, 1, 0), ("K", k, 1, 1, 0)]
    else:
        a = arr.astype(np.float64)
        r, g, b = a[..., 0], a[..., 1], a[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + level
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + level
        if subsample == 2:
            ph, pw = -(-h // 2) * 2, -(-w // 2) * 2
            cbp = np.pad(cb, ((0, ph - h), (0, pw - w)), mode="edge")
            crp = np.pad(cr, ((0, ph - h), (0, pw - w)), mode="edge")
            cb = cbp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
        comps = [("Y", y, subsample, subsample, 0),
                 ("Cb", cb, 1, 1, 1), ("Cr", cr, 1, 1, 1)]
    hmax = max(c[2] for c in comps)
    vmax = max(c[3] for c in comps)
    mcu_cols = -(-w // (8 * hmax))
    mcu_rows = -(-h // (8 * vmax))
    padded = []
    for _name, plane, ch, cv, _tq in comps:
        th, tw = mcu_rows * cv * 8, mcu_cols * ch * 8
        p = np.pad(plane, ((0, th - plane.shape[0]),
                           (0, tw - plane.shape[1])), mode="edge")
        padded.append(p)
    return gray, h, w, comps, padded, hmax, vmax, mcu_cols, mcu_rows


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _dqt_seg(tq: int, t: np.ndarray) -> bytes:
    zz = bytes(int(t[r, c]) for r, c in _ZIGZAG)
    return _seg(_DQT, bytes([tq]) + zz)


def _dht_seg(tc: int, th: int, bits: list[int], vals: bytes) -> bytes:
    return _seg(_DHT, bytes([(tc << 4) | th]) + bytes(bits) + vals)


def encode_baseline_jpeg(arr: np.ndarray, subsample: int = 1,
                         restart_interval: int = 0,
                         default_tables: bool = False,
                         precision: int = 8,
                         ycck: bool = False,
                         adobe_rgb: bool = False) -> bytes:
    """Encode (h, w) grayscale or (h, w, 3) RGB uint8 to a sequential
    JPEG; ``subsample=2`` emits 4:2:0 chroma (exercises the decoder's
    general MCU geometry), 1 emits 4:4:4; ``restart_interval=N``
    emits DRI + RSTn markers every N MCUs (exercises the decoder's
    restart realignment + DC-prediction reset).
    ``default_tables=True`` entropy-codes with the Annex K typical
    tables and OMITS the DHT segments entirely — the OpenDML
    MJPEG-in-AVI shape — so the decoder's default-table fallback is
    roundtrip-testable without an external codec.  ``precision=12``
    takes uint16 samples in 0..4095 and emits an EXTENDED sequential
    frame (SOF1 — baseline is 8-bit by definition, B.2.2) with the
    widened DC/AC symbol alphabets.  A 4-channel input is Adobe
    INVERTED CMYK and emits the APP14 Adobe marker (transform 0, or 2
    with ``ycck=True`` — the YCCK layout); ``adobe_rgb=True`` stores
    a 3-channel input as raw R,G,B planes with APP14 transform 0."""
    if precision not in (8, 12):
        raise ValueError(f"precision must be 8 or 12: {precision}")
    if precision == 12 and default_tables:
        raise ValueError("the Annex K tables are 8-bit alphabets")
    (gray, h, w, comps, padded,
     _hmax, _vmax, mcu_cols, mcu_rows) = _mcu_geometry(
        arr, subsample, precision, ycck=ycck, adobe_rgb=adobe_rgb)
    level = float(1 << (precision - 1))

    out = bytearray(b"\xff\xd8")
    if len(comps) == 4 or (adobe_rgb and len(comps) == 3):
        # APP14 Adobe: version 100, flags 0/0, transform byte
        out += _seg(0xEE, b"Adobe"
                    + struct.pack(">HHHB", 100, 0, 0, 2 if ycck else 0))
    out += _dqt_seg(0, _Q_LUMA)
    if not gray:
        out += _dqt_seg(1, _Q_CHROMA)
    sof = bytes([precision]) + struct.pack(">HHB", h, w, len(comps))
    for i, (_name, _p, ch, cv, tq) in enumerate(comps):
        sof += bytes([i + 1, (ch << 4) | cv, tq])
    out += _seg(_SOF0 if precision == 8 else _SOF1, sof)
    if default_tables:
        enc_for = {
            0: (_encode_table(_K_DC_LUMA_BITS, _K_DC_LUMA_VALS),
                _encode_table(_K_AC_LUMA_BITS, _K_AC_LUMA_VALS)),
            1: (_encode_table(_K_DC_CHROMA_BITS, _K_DC_CHROMA_VALS),
                _encode_table(_K_AC_CHROMA_BITS, _K_AC_CHROMA_VALS)),
        }
    elif precision == 12:
        enc_for = {0: (_DC_ENC12, _AC_ENC12), 1: (_DC_ENC12, _AC_ENC12)}
        out += _dht_seg(0, 0, _DC_BITS12, _DC_VALS12)
        out += _dht_seg(1, 0, _AC_BITS12, _AC_SYMBOLS12)
    else:
        enc_for = {0: (_DC_ENC, _AC_ENC), 1: (_DC_ENC, _AC_ENC)}
        out += _dht_seg(0, 0, _DC_BITS, _DC_VALS)
        out += _dht_seg(1, 0, _AC_BITS, _AC_SYMBOLS)
    if restart_interval:
        out += _seg(_DRI, struct.pack(">H", restart_interval))
    sos = bytes([len(comps)])
    for i in range(len(comps)):
        tid = 1 if (default_tables and i > 0) else 0
        sos += bytes([i + 1, (tid << 4) | tid])
    sos += bytes([0, 63, 0])
    out += _seg(_SOS, sos)
    writer = _BitWriter()
    preds = [0] * len(comps)
    n_mcus = mcu_rows * mcu_cols
    for m in range(n_mcus):
        if restart_interval and m and m % restart_interval == 0:
            out += writer.flush()
            out += bytes([0xFF, 0xD0 + ((m // restart_interval - 1) % 8)])
            writer = _BitWriter()
            preds = [0] * len(comps)
        my, mx = divmod(m, mcu_cols)
        for i, (_name, _p, ch, cv, tq) in enumerate(comps):
            q = _Q_LUMA if tq == 0 else _Q_CHROMA
            dc_enc, ac_enc = enc_for[1 if (default_tables and i > 0) else 0]
            for by in range(cv):
                for bx in range(ch):
                    py = (my * cv + by) * 8
                    px = (mx * ch + bx) * 8
                    block = padded[i][py:py + 8, px:px + 8]
                    preds[i] = _encode_block(writer, block, q, preds[i],
                                             dc_enc, ac_enc, level)
    out += writer.flush()
    out += b"\xff\xd9"
    return bytes(out)


# --- progressive encoder (Annex G; the decoder's roundtrip source) ----
#
# Fixed scan script exercising every progressive decode path: DC first
# at Al=1 (interleaved), per-component AC first over two spectral
# bands at Al=1, then the successive-approximation refinements (DC
# bit-completion, AC correction-bit scans) down to Al=0.  End-of-band
# runs are emitted per block (EOB0 only) — legal, just less compressed
# than cross-block EOBRUN accumulation.

_PROG_BANDS = [(1, 5), (6, 63)]


def _quantized_zigzag(padded, comps, level: float = 128.0):
    """Per component: (nbh, nbw, 64) int32 quantized coefficients in
    zigzag order over the MCU-padded plane."""
    out = []
    for (_name, _p, _ch, _cv, tq), plane in zip(comps, padded):
        q = _Q_LUMA if tq == 0 else _Q_CHROMA
        nbh, nbw = plane.shape[0] // 8, plane.shape[1] // 8
        nat = np.zeros((nbh, nbw, 64), dtype=np.int32)
        for by in range(nbh):
            for bx in range(nbw):
                block = plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
                # the EXACT per-block expression _encode_block uses —
                # a vectorized einsum changes float summation order
                # and can flip round-half ties, breaking the tests'
                # baseline-equals-progressive pixel assertion
                co = np.round((_C @ (block - level) @ _C.T) / q)
                nat[by, bx] = co.astype(np.int32).ravel()
        # gather through the same natural-index permutation the
        # decoder's _finish scatters through
        out.append(nat[:, :, _ZZ_FLAT])
    return out


def _enc_ac_first_block(writer, band, ac_enc) -> None:
    """First-scan band encode: sequential-style RLE of the
    point-transformed values, EOB0 for the zero tail."""
    last = -1
    for i in range(len(band) - 1, -1, -1):
        if band[i]:
            last = i
            break
    run = 0
    for i in range(last + 1):
        v = int(band[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_enc[0xF0]
            writer.write(c, ln)
            run -= 16
        s, mag = _mag(v)
        c, ln = ac_enc[(run << 4) | s]
        writer.write(c, ln)
        writer.write(mag, s)
        run = 0
    if last < len(band) - 1:
        c, ln = ac_enc[0x00]
        writer.write(c, ln)


def _enc_ac_refine_block(writer, band_full, al, ac_enc) -> None:
    """Refinement band encode (the encoder dual of G.1.2.3):
    newly-nonzero coefficients emit (zero-history run, size 1) +
    sign; already-nonzero coefficients buffer their next magnitude
    bit, flushed after the symbol whose span covers them."""
    p1 = 1 << al
    absv = [abs(int(v)) >> al for v in band_full]
    eob = -1
    for i, t in enumerate(absv):
        if t == 1:
            eob = i
    run = 0
    buffered: list[int] = []
    for i, t in enumerate(absv):
        if t == 0:
            run += 1
            continue
        while run > 15 and i <= eob:
            c, ln = ac_enc[0xF0]
            writer.write(c, ln)
            run -= 16
            for b in buffered:
                writer.write(b, 1)
            buffered = []
        if t > 1:  # already nonzero at coarser precision
            buffered.append(t & 1)
            continue
        c, ln = ac_enc[(run << 4) | 1]
        writer.write(c, ln)
        writer.write(1 if int(band_full[i]) > 0 else 0, 1)
        for b in buffered:
            writer.write(b, 1)
        buffered = []
        run = 0
    if run > 0 or buffered:
        c, ln = ac_enc[0x00]
        writer.write(c, ln)
        for b in buffered:
            writer.write(b, 1)


def encode_progressive_jpeg(arr: np.ndarray, subsample: int = 1,
                            restart_interval: int = 0,
                            precision: int = 8) -> bytes:
    """Encode (h, w) grayscale or (h, w, 3) RGB uint8 to a progressive
    (SOF2) JPEG — the decoder's roundtrip source for spectral
    selection + successive approximation, no external codec needed.
    Quantized coefficients are identical to ``encode_baseline_jpeg``'s
    (same tables, same forward path), so the decoded pixels of the
    two encodings must match exactly — the strongest cross-check the
    tests assert.  ``restart_interval`` plants DRI + RSTn in every
    scan (MCU units in the interleaved DC scans, block units in the
    non-interleaved AC scans, per A.2.2/A.2.3).  ``precision=12``
    takes uint16 samples in 0..4095 (level shift 2048, widened
    symbol alphabets)."""
    if precision not in (8, 12):
        raise ValueError(f"precision must be 8 or 12: {precision}")
    (gray, h, w, comps, padded,
     _hmax, _vmax, mcu_cols, mcu_rows) = _mcu_geometry(
        arr, subsample, precision)
    zz = _quantized_zigzag(padded, comps, float(1 << (precision - 1)))
    dc_enc = _DC_ENC if precision == 8 else _DC_ENC12
    ac_enc = _AC_ENC if precision == 8 else _AC_ENC12

    out = bytearray(b"\xff\xd8")
    out += _dqt_seg(0, _Q_LUMA)
    if not gray:
        out += _dqt_seg(1, _Q_CHROMA)
    sof = bytes([precision]) + struct.pack(">HHB", h, w, len(comps))
    for i, (_name, _p, ch, cv, tq) in enumerate(comps):
        sof += bytes([i + 1, (ch << 4) | cv, tq])
    out += _seg(_SOF2, sof)
    if precision == 12:
        out += _dht_seg(0, 0, _DC_BITS12, _DC_VALS12)
        out += _dht_seg(1, 0, _AC_BITS12, _AC_SYMBOLS12)
    else:
        out += _dht_seg(0, 0, _DC_BITS, _DC_VALS)
        out += _dht_seg(1, 0, _AC_BITS, _AC_SYMBOLS)
    if restart_interval:
        out += _seg(_DRI, struct.pack(">H", restart_interval))

    def sos(comp_ids, ss, se, ah, al) -> bytes:
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            body += bytes([cid, 0x00])  # DC/AC table id 0
        return _seg(_SOS, body + bytes([ss, se, (ah << 4) | al]))

    def run_scan(header, units, encode_unit, reset=None):
        """Entropy-code one scan; ``reset`` (when given) re-seeds the
        cross-unit state (DC predictions) at each restart marker."""
        nonlocal out
        out += header
        writer = _BitWriter()
        for u, unit in enumerate(units):
            if restart_interval and u and u % restart_interval == 0:
                out += writer.flush()
                out += bytes([
                    0xFF, 0xD0 + ((u // restart_interval - 1) % 8)])
                writer = _BitWriter()
                if reset is not None:
                    reset()
            encode_unit(writer, unit)
        out += writer.flush()

    def mcu_units():
        for m in range(mcu_rows * mcu_cols):
            my, mx = divmod(m, mcu_cols)
            unit = []
            for i, (_name, _p, ch, cv, _tq) in enumerate(comps):
                for by in range(cv):
                    for bx in range(ch):
                        unit.append((i, my * cv + by, mx * ch + bx))
            yield unit

    def comp_blocks(i):
        # non-interleaved AC scans cover the component's own block
        # grid (A.2.2) — may be smaller than the MCU-padded grid
        _name, _p, ch, cv, _tq = comps[i]
        comp_w = -(-w * ch // _hmax)
        comp_h = -(-h * cv // _vmax)
        nbw, nbh = -(-comp_w // 8), -(-comp_h // 8)
        return [(i, by, bx) for by in range(nbh) for bx in range(nbw)]

    all_ids = [i + 1 for i in range(len(comps))]
    preds = [0] * len(comps)

    def reset_preds():
        preds[:] = [0] * len(comps)

    def dc_first(writer, unit):
        for i, by, bx in unit:
            dc = int(zz[i][by, bx, 0]) >> 1  # Al=1 point transform
            s, mag = _mag(dc - preds[i])
            code, ln = dc_enc[s]
            writer.write(code, ln)
            if s:
                writer.write(mag, s)
            preds[i] = dc

    def dc_refine(writer, unit):
        for i, by, bx in unit:
            writer.write(int(zz[i][by, bx, 0]) & 1, 1)

    def ac_first(ss, se):
        def enc(writer, unit):
            ci, by, bx = unit
            band = zz[ci][by, bx, ss:se + 1]
            v1 = np.sign(band) * (np.abs(band) >> 1)
            _enc_ac_first_block(writer, v1, ac_enc)
        return enc

    def ac_refine(ss, se):
        def enc(writer, unit):
            ci, by, bx = unit
            _enc_ac_refine_block(writer, zz[ci][by, bx, ss:se + 1],
                                 0, ac_enc)
        return enc

    run_scan(sos(all_ids, 0, 0, 0, 1), mcu_units(), dc_first,
             reset=reset_preds)
    for i in range(len(comps)):
        for ss, se in _PROG_BANDS:
            run_scan(sos([i + 1], ss, se, 0, 1), comp_blocks(i),
                     ac_first(ss, se))
    run_scan(sos(all_ids, 0, 0, 1, 0), mcu_units(), dc_refine)
    for i in range(len(comps)):
        for ss, se in _PROG_BANDS:
            run_scan(sos([i + 1], ss, se, 1, 0), comp_blocks(i),
                     ac_refine(ss, se))
    out += b"\xff\xd9"
    return bytes(out)
