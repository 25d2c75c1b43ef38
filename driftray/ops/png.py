"""Minimal pure-numpy PNG codec (public PNG spec, RFC 2083).

This container ships no image libraries, so the multimodal decode stage
would otherwise stay a stub.  PNG's baseline profile needs only stdlib
``zlib`` + ``struct``: this module encodes/decodes non-interlaced 8-bit
grayscale / RGB / RGBA images — enough for a REAL round-trip through the
decode actor pool on real bytes.  ``ops.multimodal.ImageDecoder`` prefers
PIL when importable and falls back here for PNG payloads.

Decode handles all five baseline filter types; rows are unfiltered
sequentially (data dependency), but each row's arithmetic is vectorized
numpy.  Not supported (raises ValueError): interlacing, bit depths ≠ 8,
palette images.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type → samples per pixel


def encode_png(img: np.ndarray) -> bytes:
    """Encode HxW (grayscale), HxWx3 (RGB) or HxWx4 (RGBA) uint8 → PNG."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # filter type 0 (None) per scanline
    raw = np.empty((h, 1 + w * c), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = img.reshape(h, w * c)
    return (_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw.tobytes(), 6))
            + chunk(b"IEND", b""))


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa_, pb, pc_ = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa_ <= pb) & (pa_ <= pc_), a, np.where(pb <= pc_, b, c))
    return out.astype(np.uint8)


def decode_png(data: bytes) -> np.ndarray:
    """Decode a baseline PNG → HxWxC uint8 (C dropped for grayscale)."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, idat, ihdr = 8, [], None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, color_type, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace != 0 or color_type not in _CHANNELS:
        raise ValueError(
            f"unsupported PNG (depth={depth}, color_type={color_type}, "
            f"interlace={interlace}) — baseline 8-bit only")
    c = _CHANNELS[color_type]
    stride = w * c
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    raw = raw.reshape(h, 1 + stride)
    out = np.empty((h, stride), dtype=np.uint8)
    zero = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        ftype, line = raw[y, 0], raw[y, 1:]
        prev = out[y - 1] if y else zero
        if ftype == 0:
            out[y] = line
        elif ftype == 1:  # Sub — sequential in x, vectorize per pixel-column
            cur = line.reshape(w, c).astype(np.uint16)
            acc = np.zeros(c, dtype=np.uint16)
            res = np.empty((w, c), dtype=np.uint8)
            for x in range(w):
                acc = (cur[x] + acc) & 0xFF
                res[x] = acc
            out[y] = res.reshape(stride)
        elif ftype == 2:  # Up
            out[y] = (line.astype(np.uint16) + prev) & 0xFF
        elif ftype == 3:  # Average
            res = np.empty(stride, dtype=np.uint8)
            for i in range(stride):
                left = res[i - c] if i >= c else 0
                res[i] = (int(line[i]) + ((int(left) + int(prev[i])) >> 1)) & 0xFF
            out[y] = res
        elif ftype == 4:  # Paeth
            res = np.empty(stride, dtype=np.uint8)
            for i in range(stride):
                left = res[i - c] if i >= c else np.uint8(0)
                ul = prev[i - c] if i >= c else np.uint8(0)
                pr = _paeth(np.asarray(left), np.asarray(prev[i]),
                            np.asarray(ul))
                res[i] = (int(line[i]) + int(pr)) & 0xFF
            out[y] = res
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
    img = out.reshape(h, w, c)
    return img[:, :, 0] if c == 1 else img
