"""Pure numpy/stdlib baseline JPEG codec (ITU T.81, public spec).

Closes the last multimodal decode stub this container can close
without optional dependencies: ``decode_media``'s MJPEG branch needs
per-frame PIXELS, and Pillow/PyAV are absent here — so the baseline
sequential-DCT Huffman path (the codec every MJPEG stream in the wild
uses) is implemented directly from the public standard:

- marker walk (reusing the same segment grammar as
  ``multimodal._jpeg_dims``): DQT, DHT, SOF0, DRI, SOS;
- canonical Huffman table construction from BITS/HUFFVAL (F.2.2.3);
- entropy decode with byte unstuffing (0xFF00) and restart-marker
  handling (DC-prediction reset + bit realignment, F.2.1.3.1);
- DC prediction + AC run-length, EXTEND sign recovery (F.2.2.1),
  dequantize, inverse zigzag, float IDCT-II (separable orthonormal
  8×8 matrix — A.3.3), component assembly over general H/V sampling
  factors with nearest-neighbor chroma upsampling, JFIF full-range
  YCbCr→RGB (BT.601).

The encoder exists so the decoder is testable by ROUNDTRIP without
any external codec: it writes legal baseline 4:4:4 or 4:2:0 streams
with flat quantization tables and simple canonical Huffman tables of
its own construction (any legal DHT is valid — the decoder is
table-agnostic); frames that carry NO tables at all — the common
OpenDML MJPEG-in-AVI convention — decode through the Annex K typical
tables (K.3.3) as the implied default.

Deliberately NOT supported (declared, raises ValueError /
NotImplementedError): progressive (SOF2) and arithmetic-coded
streams, 12-bit precision, lossless hierarchies — the residue of the
multimodal stub is now exactly those.
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
_UNSUPPORTED_SOF = {0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
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
    """Decode a baseline (or extended) sequential Huffman JPEG to a
    (h, w) grayscale or (h, w, 3) RGB uint8 array."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart = 0
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
                "only baseline/extended sequential Huffman JPEG is "
                "supported (progressive/arithmetic/lossless need Pillow)")
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
        elif marker in (_SOF0, _SOF1):
            if len(body) < 6:
                raise ValueError("truncated JPEG SOF segment")
            prec, h, w, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError("12-bit JPEG needs Pillow")
            if len(body) < 6 + 3 * nc:
                raise ValueError("truncated JPEG SOF segment")
            comps = []
            for ci in range(nc):
                cid, hv, tq = struct.unpack(
                    ">BBB", body[6 + 3 * ci:9 + 3 * ci])
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker == _DRI:
            (restart,) = struct.unpack(">H", body[:2])
        elif marker == _SOS:
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            if not body or len(body) < 1 + 2 * body[0]:
                raise ValueError("truncated JPEG SOS segment")
            ns = body[0]
            if ns != len(frame["comps"]):
                raise NotImplementedError(
                    "non-interleaved JPEG scans need Pillow")
            scan = []
            for si in range(ns):
                cs, tt = body[1 + 2 * si], body[2 + 2 * si]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append((comp, tt >> 4, tt & 0xF))
            intervals, pos = _entropy_intervals(data, pos + seglen)
            return _decode_scan(frame, scan, qt, huff, intervals, restart)
        pos += seglen
    raise ValueError("JPEG missing SOS/EOI structure")


def _decode_scan(frame, scan, qt, huff, intervals, restart) -> np.ndarray:
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c in frame["comps"])
    vmax = max(c["v"] for c in frame["comps"])
    if any(hmax % c["h"] or vmax % c["v"] for c in frame["comps"]):
        raise NotImplementedError(
            "non-integer JPEG sampling ratios need Pillow")
    mcu_cols = -(-w // (8 * hmax))
    mcu_rows = -(-h // (8 * vmax))
    planes = {
        c["id"]: np.zeros((mcu_rows * c["v"] * 8, mcu_cols * c["h"] * 8))
        for c, _dc, _ac in scan
    }
    preds = {c["id"]: 0 for c, _dc, _ac in scan}
    n_mcus = mcu_rows * mcu_cols
    per_interval = restart if restart else n_mcus
    reader = None
    interval_idx = -1
    for m in range(n_mcus):
        if m % per_interval == 0:
            interval_idx += 1
            if interval_idx >= len(intervals):
                raise ValueError("JPEG restart intervals exhausted")
            reader = _BitReader(intervals[interval_idx])
            preds = {c["id"]: 0 for c, _dc, _ac in scan}
        my, mx = divmod(m, mcu_cols)
        for comp, tdc, tac in scan:
            q = qt[comp["tq"]]
            # fall back to the Annex K typical tables when the frame
            # carries no DHT for the referenced id — the OpenDML
            # MJPEG-in-AVI convention (frames omit DHT, the standard
            # tables are implied)
            dct = huff.get((0, tdc)) or _DEFAULT_HUFF.get((0, tdc))
            act = huff.get((1, tac)) or _DEFAULT_HUFF.get((1, tac))
            if dct is None or act is None:
                raise ValueError("JPEG scan references missing DHT table")
            for by in range(comp["v"]):
                for bx in range(comp["h"]):
                    coeffs = np.zeros(64, dtype=np.int32)
                    s = reader.read_symbol(dct)
                    diff = _extend(reader.read_bits(s), s)
                    preds[comp["id"]] += diff
                    coeffs[0] = preds[comp["id"]]
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
                        coeffs[k] = _extend(reader.read_bits(size), size)
                        k += 1
                    block = np.zeros((8, 8), dtype=np.float64)
                    for z, (zr, zc) in enumerate(_ZIGZAG):
                        block[zr, zc] = coeffs[z]
                    block *= q
                    spatial = _C.T @ block @ _C + 128.0
                    py = (my * comp["v"] + by) * 8
                    px = (mx * comp["h"] + bx) * 8
                    planes[comp["id"]][py:py + 8, px:px + 8] = spatial
    out = []
    for comp, _dc, _ac in scan:
        p = planes[comp["id"]]
        p = np.repeat(np.repeat(p, vmax // comp["v"], axis=0),
                      hmax // comp["h"], axis=1)
        out.append(p[:h, :w])
    if len(out) == 1:
        return np.clip(out[0] + 0.5, 0, 255).astype(np.uint8)
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    rgb = np.stack([
        y + 1.402 * cr,
        y - 0.344136 * cb - 0.714136 * cr,
        y + 1.772 * cb,
    ], axis=-1)
    return np.clip(rgb + 0.5, 0, 255).astype(np.uint8)


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
                  pred: int, dc_enc=None, ac_enc=None) -> int:
    dc_enc = _DC_ENC if dc_enc is None else dc_enc
    ac_enc = _AC_ENC if ac_enc is None else ac_enc
    coeffs = np.round((_C @ (block - 128.0) @ _C.T) / q).astype(np.int32)
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


def encode_baseline_jpeg(arr: np.ndarray, subsample: int = 1,
                         restart_interval: int = 0,
                         default_tables: bool = False) -> bytes:
    """Encode (h, w) grayscale or (h, w, 3) RGB uint8 to a baseline
    JPEG; ``subsample=2`` emits 4:2:0 chroma (exercises the decoder's
    general MCU geometry), 1 emits 4:4:4; ``restart_interval=N``
    emits DRI + RSTn markers every N MCUs (exercises the decoder's
    restart realignment + DC-prediction reset).
    ``default_tables=True`` entropy-codes with the Annex K typical
    tables and OMITS the DHT segments entirely — the OpenDML
    MJPEG-in-AVI shape — so the decoder's default-table fallback is
    roundtrip-testable without an external codec."""
    arr = np.asarray(arr)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if gray:
        comps = [("Y", arr.astype(np.float64), 1, 1, 0)]
        subsample = 1
    else:
        a = arr.astype(np.float64)
        r, g, b = a[..., 0], a[..., 1], a[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
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

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    def dqt(tq: int, t: np.ndarray) -> bytes:
        zz = bytes(int(t[r, c]) for r, c in _ZIGZAG)
        return seg(_DQT, bytes([tq]) + zz)

    def dht(tc: int, th: int, bits: list[int], vals: bytes) -> bytes:
        return seg(_DHT, bytes([(tc << 4) | th]) + bytes(bits) + vals)

    out = bytearray(b"\xff\xd8")
    out += dqt(0, _Q_LUMA)
    if not gray:
        out += dqt(1, _Q_CHROMA)
    sof = bytes([8]) + struct.pack(">HHB", h, w, len(comps))
    for i, (_name, _p, ch, cv, tq) in enumerate(comps):
        sof += bytes([i + 1, (ch << 4) | cv, tq])
    out += seg(_SOF0, sof)
    if default_tables:
        enc_for = {
            0: (_encode_table(_K_DC_LUMA_BITS, _K_DC_LUMA_VALS),
                _encode_table(_K_AC_LUMA_BITS, _K_AC_LUMA_VALS)),
            1: (_encode_table(_K_DC_CHROMA_BITS, _K_DC_CHROMA_VALS),
                _encode_table(_K_AC_CHROMA_BITS, _K_AC_CHROMA_VALS)),
        }
    else:
        enc_for = {0: (_DC_ENC, _AC_ENC), 1: (_DC_ENC, _AC_ENC)}
        out += dht(0, 0, _DC_BITS, _DC_VALS)
        out += dht(1, 0, _AC_BITS, _AC_SYMBOLS)
    if restart_interval:
        out += seg(_DRI, struct.pack(">H", restart_interval))
    sos = bytes([len(comps)])
    for i in range(len(comps)):
        tid = 1 if (default_tables and i > 0) else 0
        sos += bytes([i + 1, (tid << 4) | tid])
    sos += bytes([0, 63, 0])
    out += seg(_SOS, sos)
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
                                             dc_enc, ac_enc)
    out += writer.flush()
    out += b"\xff\xd9"
    return bytes(out)
