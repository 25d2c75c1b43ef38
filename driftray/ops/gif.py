"""Dependency-free GIF89a codec (animated) — the real-bytes path for the
video/frame-sampling stage (`ops/multimodal.FrameSampler(decoder="gif")`).

Like `ops/png.py` / `ops/jpeg.py`, this exists because the container has
no media libraries: everything here is stdlib + numpy, built from the
public GIF89a specification.  The decoder handles what real files
contain — global/local color tables, variable-length LZW with table
resets, sub-rectangle frames, disposal methods 0/1/2, transparency,
interlaced images, and per-frame delays from Graphic Control Extensions.
The encoder emits full-frame animations (exact palette when a frame set
has ≤256 distinct colors, deterministic uniform 6x7x6 quantization
otherwise) and can write interlaced row order, so round-trip tests drive
the decoder's real-world paths.

Reference parity note: the reference repo has no media handling at all;
this is from the LLM-pipeline brief (multimodal columns: decode /
frame-sample as actor-pool stages over binary payload columns).
"""

from __future__ import annotations

import struct

import numpy as np

# interlace pass layout: (row offset, row step) per GIF89a appendix E
_INTERLACE = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlaced_order(h: int) -> np.ndarray:
    return np.concatenate([np.arange(off, h, step)
                           for off, step in _INTERLACE])


# ---------------------------------------------------------------------------
# LZW (GIF variant: variable code width, LSB-first, clear/EOI codes)
# ---------------------------------------------------------------------------


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0
    code_size = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[tuple[int, int], int] = {}
    next_code = eoi + 1
    emit(clear)
    cur = -1
    for k in map(int, indices):
        if cur < 0:
            cur = k
            continue
        found = table.get((cur, k))
        if found is not None:
            cur = found
            continue
        emit(cur)
        table[(cur, k)] = next_code
        next_code += 1
        if next_code == (1 << code_size) + 1 and code_size < 12:
            code_size += 1
        if next_code >= 4096:
            emit(clear)
            table.clear()
            next_code = eoi + 1
            code_size = min_code_size + 1
        cur = k
    if cur >= 0:
        emit(cur)
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    code_size = min_code_size + 1
    acc = 0
    nbits = 0
    pos = 0
    out = bytearray()
    prev: bytes | None = None
    while len(out) < n_pixels:
        while nbits < code_size:
            if pos >= len(data):
                raise ValueError("GIF: truncated LZW stream")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]          # the KwKwK case
        else:
            raise ValueError(f"GIF: bad LZW code {code}")
        out += entry
        if prev is not None:
            table.append(prev + entry[:1])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    if len(out) < n_pixels:
        raise ValueError("GIF: LZW stream ended early")
    return np.frombuffer(bytes(out[:n_pixels]), dtype=np.uint8)


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def _read_sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        n = data[pos]
        pos += 1
        if n == 0:
            return bytes(out), pos
        out += data[pos:pos + n]
        pos += n


# ---------------------------------------------------------------------------
# palette
# ---------------------------------------------------------------------------

_QLEVELS = (6, 7, 6)                   # uniform fallback quantizer (252 cells)


def _build_palette(frames: list[np.ndarray]) -> tuple[np.ndarray, list[np.ndarray]]:
    """Exact palette when the frame set has ≤256 distinct colors, else a
    deterministic uniform 6x7x6 quantization.  Returns (palette Nx3,
    per-frame index arrays)."""
    allpix = np.concatenate([f.reshape(-1, 3) for f in frames])
    colors = np.unique(allpix, axis=0)
    if len(colors) <= 256:
        lut = {tuple(c): i for i, c in enumerate(colors)}
        idx = [np.array([lut[tuple(p)] for p in f.reshape(-1, 3)],
                        dtype=np.uint8).reshape(f.shape[:2]) for f in frames]
        return colors, idx
    lr, lg, lb = _QLEVELS
    grid = np.stack(np.meshgrid(
        np.linspace(0, 255, lr), np.linspace(0, 255, lg),
        np.linspace(0, 255, lb), indexing="ij"), axis=-1)
    palette = np.round(grid.reshape(-1, 3)).astype(np.uint8)

    def quant(f: np.ndarray) -> np.ndarray:
        r = np.clip(np.round(f[..., 0] / 255 * (lr - 1)), 0, lr - 1)
        g = np.clip(np.round(f[..., 1] / 255 * (lg - 1)), 0, lg - 1)
        b = np.clip(np.round(f[..., 2] / 255 * (lb - 1)), 0, lb - 1)
        return (r * lg * lb + g * lb + b).astype(np.uint8)

    return palette, [quant(f) for f in frames]


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


def encode_gif(frames: list[np.ndarray] | np.ndarray,
               delay_ms: int = 100, interlace: bool = False,
               loop: bool = True) -> bytes:
    """HxWx3 uint8 frame(s) → animated GIF89a bytes.

    Full-frame animation, one global color table (exact when ≤256
    distinct colors across all frames, uniform-quantized otherwise),
    per-frame Graphic Control Extensions carrying ``delay_ms``
    (centisecond resolution, as the format defines)."""
    if isinstance(frames, np.ndarray) and frames.ndim == 3:
        frames = [frames]
    frames = [np.asarray(f) for f in frames]
    if not frames or any(f.dtype != np.uint8 or f.ndim != 3 for f in frames):
        raise ValueError("encode_gif expects HxWx3 uint8 frames")
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise ValueError("all frames must share one size")

    palette, indexed = _build_palette(frames)
    pal_bits = max(1, int(np.ceil(np.log2(max(len(palette), 2)))))
    pal_size = 1 << pal_bits
    pal_bytes = np.zeros((pal_size, 3), dtype=np.uint8)
    pal_bytes[:len(palette)] = palette

    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | (pal_bits - 1) << 4
                       | (pal_bits - 1), 0, 0)
    out += pal_bytes.tobytes()
    if loop and len(frames) > 1:
        out += b"\x21\xff\x0bNETSCAPE2.0" + _sub_blocks(b"\x01\x00\x00")[:-1] \
            + b"\x00"
    mcs = max(2, pal_bits)
    for idx in indexed:
        out += b"\x21\xf9" + struct.pack("<BBHBB", 4, 0x04,  # disposal 1
                                         max(delay_ms // 10, 1), 0, 0)
        flags = 0x40 if interlace else 0
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, flags)
        rows = idx[_interlaced_order(h)] if interlace else idx
        out += bytes([mcs]) + _sub_blocks(_lzw_encode(rows.reshape(-1), mcs))
    out += b"\x3b"
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def decode_gif(data: bytes) -> tuple[np.ndarray, list[int]]:
    """GIF bytes → (frames array n_frames×H×W×3 uint8, per-frame delay
    ms).  Composites sub-rectangle frames honoring disposal methods
    0/1 (leave) and 2 (restore to background) and transparency; supports
    global and local color tables, interlacing, and LZW table resets."""
    if data[:6] not in (b"GIF89a", b"GIF87a"):
        raise ValueError("not a GIF stream")
    w, h, flags, bg_idx, _ = struct.unpack("<HHBBB", data[6:13])
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data[pos:pos + 3 * n],
                            dtype=np.uint8).reshape(-1, 3)
        pos += 3 * n

    canvas = np.zeros((h, w, 3), dtype=np.uint8)
    if gct is not None and bg_idx < len(gct):
        canvas[:] = gct[bg_idx]
    frames: list[np.ndarray] = []
    delays: list[int] = []
    transparent: int | None = None
    disposal = 0
    delay_cs = 0

    while pos < len(data):
        b0 = data[pos]
        pos += 1
        if b0 == 0x3B:                       # trailer
            break
        if b0 == 0x21:                       # extension
            label = data[pos]
            pos += 1
            if label == 0xF9:                # graphic control
                blk, pos = _read_sub_blocks(data, pos)
                gflags, delay_cs, tidx = struct.unpack("<BHB", blk[:4])
                disposal = (gflags >> 2) & 0x07
                transparent = tidx if gflags & 0x01 else None
            else:                            # application/comment/plain text
                _, pos = _read_sub_blocks(data, pos)
            continue
        if b0 != 0x2C:
            raise ValueError(f"GIF: unexpected block 0x{b0:02x}")
        fx, fy, fw, fh, iflags = struct.unpack("<HHHHB", data[pos:pos + 9])
        pos += 9
        pal = gct
        if iflags & 0x80:
            n = 2 << (iflags & 0x07)
            pal = np.frombuffer(data[pos:pos + 3 * n],
                                dtype=np.uint8).reshape(-1, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF: image without any color table")
        mcs = data[pos]
        pos += 1
        lzw, pos = _read_sub_blocks(data, pos)
        idx = _lzw_decode(lzw, mcs, fw * fh).reshape(fh, fw)
        if iflags & 0x40:                    # deinterlace
            deinter = np.empty_like(idx)
            deinter[_interlaced_order(fh)] = idx
            idx = deinter

        before = canvas.copy() if disposal == 2 else None
        region = canvas[fy:fy + fh, fx:fx + fw]
        rgb = pal[np.minimum(idx, len(pal) - 1)]
        if transparent is not None:
            mask = idx != transparent
            region[mask] = rgb[mask]
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        delays.append(delay_cs * 10)
        if disposal == 2:
            restore = before[fy:fy + fh, fx:fx + fw].copy()
            if gct is not None and bg_idx < len(gct):
                restore[:] = gct[bg_idx]
            canvas[fy:fy + fh, fx:fx + fw] = restore
        transparent = None
        disposal = 0
        delay_cs = 0
    if not frames:
        raise ValueError("GIF: no image frames")
    return np.stack(frames), delays
