"""Dependency-free baseline JPEG codec (stdlib + numpy).

Companion to ``ops/png.py``: gives the multimodal decode stage a REAL
jpeg path in this container (no PIL/libjpeg available).  Scope:

* ``decode_jpeg`` — baseline sequential DCT JPEGs (SOF0): honors the
  stream's OWN quantization (DQT) and Huffman (DHT) tables, arbitrary
  chroma subsampling factors (4:4:4 / 4:2:2 / 4:2:0 / ...), restart
  intervals (DRI + RSTn), grayscale or YCbCr.  Progressive (SOF2),
  arithmetic coding, and 12-bit precision raise ``NotImplementedError``.
* ``encode_jpeg`` — baseline 4:4:4 with the standard Annex-K tables and
  libjpeg-style quality scaling; useful for fixtures and round-trips.

Performance honesty: entropy (Huffman) decoding is a sequential
bit-stream walk — pure Python here, vectorizing only the back half
(dequantize + IDCT + color convert run as single einsum/numpy passes over
all blocks).  Fine for thumbnails/tests; for production throughput use
``decoder="pillow"`` where PIL exists.  JPEG is lossy: round-trip tests
assert PSNR, not equality.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# constants: zigzag, Annex-K quantization + Huffman tables
# ---------------------------------------------------------------------------


def _zigzag_order() -> np.ndarray:
    idx = np.arange(64).reshape(8, 8)
    out = []
    for d in range(15):
        diag = [(i, d - i) for i in range(8) if 0 <= d - i < 8]
        if d % 2 == 0:
            diag.reverse()
        out.extend(idx[i, j] for i, j in diag)
    return np.array(out, dtype=np.int64)


ZIGZAG = _zigzag_order()            # zigzag position -> raster position
UNZIGZAG = np.argsort(ZIGZAG)

QT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64).reshape(8, 8)

QT_CHROM = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64).reshape(8, 8)

# standard Huffman specs: (BITS[1..16], HUFFVAL)
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROM_VALS = list(range(12))
AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]
AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROM_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA]

# orthonormal 8x8 DCT-II matrix: block_coeffs = C @ block @ C.T
_k = np.arange(8).reshape(8, 1)
_n = np.arange(8).reshape(1, 8)
DCT_M = np.sqrt(2.0 / 8.0) * np.cos((2 * _n + 1) * _k * np.pi / 16.0)
DCT_M[0] /= np.sqrt(2.0)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) canonical Huffman assignment."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol lookup for the sequential bit reader."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def _quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.buf.append(b)
            if b == 0xFF:               # byte stuffing
                self.buf.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)   # pad with 1-bits per spec


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _mag_bits(v: int, s: int) -> int:
    return v if v >= 0 else v + (1 << s) - 1


def _encode_block(bw: _BitWriter, coeffs: np.ndarray, pred: int,
                  dc_codes: dict, ac_codes: dict) -> int:
    """coeffs: 64 zigzag-ordered quantized ints. Returns new DC pred."""
    dc = int(coeffs[0])
    diff = dc - pred
    s = _category(diff)
    bw.write(*dc_codes[s])
    if s:
        bw.write(_mag_bits(diff, s), s)
    run = 0
    for i in range(1, 64):
        v = int(coeffs[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            bw.write(*ac_codes[0xF0])   # ZRL
            run -= 16
        s = _category(v)
        bw.write(*ac_codes[(run << 4) | s])
        bw.write(_mag_bits(v, s), s)
        run = 0
    if run:
        bw.write(*ac_codes[0x00])       # EOB
    return dc


def encode_jpeg(img: np.ndarray, quality: int = 85,
                subsample: str = "444", restart_interval: int = 0) -> bytes:
    """Encode HxW (grayscale) or HxWx3 (RGB) uint8 to baseline JPEG.

    ``subsample``: "444" (no chroma subsampling) or "420" (2x2 mean-pooled
    chroma — the common real-world layout).  ``restart_interval`` > 0
    emits a DRI segment and RSTn markers every that many MCUs (what
    camera/libjpeg streams do for error resilience) — together these let
    the round-trip tests drive the decoder's MCU-interleave and restart
    paths on genuinely structured streams."""
    img = np.asarray(img)
    if img.dtype != np.uint8:
        raise ValueError("encode_jpeg expects uint8")
    if subsample not in ("444", "420"):
        raise ValueError("subsample must be '444' or '420'")
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        planes = [img.astype(np.float64)]
    else:
        r, g, b = (img[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]

    qlum = _quality_scale(QT_LUM, quality)
    qchrom = _quality_scale(QT_CHROM, quality)
    qts = [qlum] + ([qchrom, qchrom] if not gray else [])

    ncomp = 1 if gray else 3
    if gray or subsample == "444":
        sampling = [(1, 1)] * ncomp
    else:
        sampling = [(2, 2), (1, 1), (1, 1)]
        # 2x2 mean-pool chroma (pad to even first, edge replicate)
        for i in (1, 2):
            p = planes[i]
            p = np.pad(p, ((0, p.shape[0] % 2), (0, p.shape[1] % 2)),
                       mode="edge")
            planes[i] = p.reshape(p.shape[0] // 2, 2,
                                  p.shape[1] // 2, 2).mean(axis=(1, 3))
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)

    out = bytearray(b"\xff\xd8")                      # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00" \
        + struct.pack(">HH", 1, 1) + b"\x00\x00"      # APP0
    for tid, qt in enumerate([qlum] if gray else [qlum, qchrom]):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) \
            + bytes(qt.reshape(-1)[ZIGZAG].astype(np.uint8))
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * ncomp, 8, h, w, ncomp)
    for ci in range(ncomp):
        hv = (sampling[ci][0] << 4) | sampling[ci][1]
        out += bytes([ci + 1, hv, 0 if ci == 0 else 1])
    huff_specs = [(0x00, DC_LUM_BITS, DC_LUM_VALS),
                  (0x10, AC_LUM_BITS, AC_LUM_VALS)]
    if not gray:
        huff_specs += [(0x01, DC_CHROM_BITS, DC_CHROM_VALS),
                       (0x11, AC_CHROM_BITS, AC_CHROM_VALS)]
    for tc, bits, vals in huff_specs:
        out += b"\xff\xc4" + struct.pack(">H", 19 + len(vals)) \
            + bytes([tc]) + bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ncomp, ncomp)
    for ci in range(ncomp):
        out += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    out += b"\x00\x3f\x00"

    dc_lum = _canonical_codes(DC_LUM_BITS, DC_LUM_VALS)
    ac_lum = _canonical_codes(AC_LUM_BITS, AC_LUM_VALS)
    dc_chrom = _canonical_codes(DC_CHROM_BITS, DC_CHROM_VALS)
    ac_chrom = _canonical_codes(AC_CHROM_BITS, AC_CHROM_VALS)

    # pad each plane to its MCU grid (edge replicate), DCT + quantize
    quantized = []
    for plane, qt, (hi, vi) in zip(planes, qts, sampling):
        bh_i, bw_i = mcuy * vi, mcux * hi
        p = np.pad(plane, ((0, bh_i * 8 - plane.shape[0]),
                           (0, bw_i * 8 - plane.shape[1])), mode="edge")
        blocks = p.reshape(bh_i, 8, bw_i, 8).transpose(0, 2, 1, 3) - 128.0
        coeffs = np.einsum("ij,abjk,lk->abil", DCT_M, blocks, DCT_M)
        q = np.round(coeffs / qt).astype(np.int64)
        quantized.append(q.reshape(bh_i, bw_i, 64)[:, :, ZIGZAG])

    writer = _BitWriter()
    preds = [0] * ncomp
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and \
                    n_mcu % restart_interval == 0:
                writer.flush()
                writer.buf += bytes(
                    [0xFF, 0xD0 + (n_mcu // restart_interval - 1) % 8])
                preds = [0] * ncomp
            for ci in range(ncomp):
                hi, vi = sampling[ci]
                dc_c = dc_lum if ci == 0 else dc_chrom
                ac_c = ac_lum if ci == 0 else ac_chrom
                for by in range(vi):
                    for bx in range(hi):
                        preds[ci] = _encode_block(
                            writer,
                            quantized[ci][my * vi + by, mx * hi + bx],
                            preds[ci], dc_c, ac_c)
            n_mcu += 1
    writer.flush()
    out += writer.buf
    out += b"\xff\xd9"                                # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


class _BitReader:
    """Entropy-segment bit reader: unstuffs FF00, stops at markers."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                self.acc = (self.acc << 8) & 0xFFFFFFFF
                self.nbits += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:      # restart marker: caller resets
                    self.marker = nxt
                    self.acc = (self.acc << 8) & 0xFFFFFFFF
                    self.nbits += 8
                    continue
                else:                           # EOI / next segment
                    self.marker = nxt
                    self.acc = (self.acc << 8) & 0xFFFFFFFF
                    self.nbits += 8
                    continue
            else:
                self.pos += 1
            self.acc = ((self.acc << 8) | b) & 0xFFFFFFFF
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_restart(self) -> None:
        """Skip to just past the pending RSTn marker and resync."""
        d = self.data
        p = self.pos
        while p + 1 < len(d):
            if d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7:
                self.pos = p + 2
                self.acc = 0
                self.nbits = 0
                self.marker = None
                return
            p += 1
        self.pos = len(d)

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in entropy stream")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Decode a baseline-sequential JPEG to uint8 HxW (gray) or HxWx3 (RGB).

    Honors the stream's own DQT/DHT, component sampling factors, and DRI
    restart intervals (chroma planes upsampled nearest-neighbour)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[int, dict] = {}
    comps: list[dict] = []
    h = w = 0
    restart_interval = 0
    scan_pos = None
    scan_comps: list[dict] = []

    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:
            break
        seglen = struct.unpack(">H", data[pos:pos + 2])[0]
        seg = data[pos + 2:pos + seglen]
        if marker == 0xDB:                       # DQT
            i = 0
            while i < len(seg):
                prec, tid = seg[i] >> 4, seg[i] & 0xF
                if prec:
                    raise NotImplementedError("16-bit quant tables")
                qt = np.frombuffer(seg[i + 1:i + 65], dtype=np.uint8)
                raster = np.zeros(64, dtype=np.int64)
                raster[ZIGZAG] = qt
                qtables[tid] = raster.reshape(8, 8)
                i += 65
        elif marker == 0xC4:                     # DHT
            i = 0
            while i < len(seg):
                tc = seg[i]
                bits = list(seg[i + 1:i + 17])
                nv = sum(bits)
                vals = list(seg[i + 17:i + 17 + nv])
                htables[tc] = _decode_table(bits, vals)
                i += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:   # SOF0/1 baseline
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise NotImplementedError("only 8-bit precision")
            comps = []
            for ci in range(nc):
                cid, hv, tq = seg[6 + 3 * ci:9 + 3 * ci]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "tq": tq})
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"non-baseline JPEG (SOF{marker - 0xC0})")
        elif marker == 0xDD:                     # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:                     # SOS
            ns = seg[0]
            scan_comps = []
            for ci in range(ns):
                cid, tables = seg[1 + 2 * ci], seg[2 + 2 * ci]
                comp = next(c for c in comps if c["id"] == cid)
                comp["td"], comp["ta"] = tables >> 4, tables & 0xF
                scan_comps.append(comp)
            scan_pos = pos + seglen
            break
        pos += seglen

    if scan_pos is None or not comps:
        raise ValueError("no scan data found")

    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    for c in comps:
        c["bw"] = mcux * c["h"]
        c["bh"] = mcuy * c["v"]
        c["coef"] = np.zeros((c["bh"], c["bw"], 64), dtype=np.int64)

    reader = _BitReader(data, scan_pos)
    preds = {c["id"]: 0 for c in comps}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                reader.align_restart()
                preds = {c["id"]: 0 for c in comps}
            for c in scan_comps:
                dc_t = htables[c["td"]]
                ac_t = htables[0x10 | c["ta"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = c["coef"][my * c["v"] + by, mx * c["h"] + bx]
                        s = reader.decode_symbol(dc_t)
                        diff = _extend(reader.read_bits(s), s) if s else 0
                        preds[c["id"]] += diff
                        blk[0] = preds[c["id"]]
                        i = 1
                        while i < 64:
                            rs = reader.decode_symbol(ac_t)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    i += 16       # ZRL
                                    continue
                                break             # EOB
                            i += r
                            if i > 63:
                                raise ValueError("AC run overflows block")
                            blk[i] = _extend(reader.read_bits(s), s)
                            i += 1
            mcu_count += 1

    # vectorized back half: dequantize + IDCT all blocks per component
    planes = []
    for c in comps:
        qt = qtables[c["tq"]].reshape(-1)
        raster = np.zeros_like(c["coef"])
        raster[:, :, ZIGZAG] = c["coef"]
        deq = (raster * qt).reshape(c["bh"], c["bw"], 8, 8).astype(np.float64)
        pix = np.einsum("ji,abjk,kl->abil", DCT_M, deq, DCT_M) + 128.0
        plane = pix.transpose(0, 2, 1, 3).reshape(c["bh"] * 8, c["bw"] * 8)
        # upsample to full res (nearest), crop
        plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)[:h, :w]
        planes.append(plane)

    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=2)), 0,
                   255).astype(np.uint8)
