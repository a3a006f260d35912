"""Pure-Python PNG codec (RFC 2083) — un-stubs the engine's `png` image
format with no external library.

Decode: 8-bit gray / gray+alpha / RGB / RGBA / palette, all five scanline
filters (none/sub/up/average/paeth), non-interlaced (Adam7 raises — no
encoder in scope emits it). Encode: 8-bit filter-0 scanlines + zlib.

Validated both directions against the JVM's javax.imageio (shipped inside
Spark — the same free-oracle trick as zstd-jni): our encoder's output
decodes to identical pixels there, and ImageIO-encoded PNGs decode to
identical pixels here (tests/test_png.py).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}  # bands → color type


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def png_decode(data: bytes) -> np.ndarray:
    """PNG bytes → (h, w, bands) uint8 (palette expands to RGB)."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    plte = None
    idat = bytearray()
    while pos + 8 <= len(data):
        length, ctype = struct.unpack(">I4s", data[pos:pos + 8])
        body = data[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + body + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8:
        raise NotImplementedError(f"PNG bit depth {depth} (only 8 supported)")
    if interlace:
        raise NotImplementedError("Adam7-interlaced PNG")
    if comp != 0 or filt != 0:
        raise ValueError("PNG with nonstandard compression/filter method")
    ch = _CHANNELS[color]
    stride = w * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline data size mismatch")
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        row = np.frombuffer(
            raw, np.uint8, stride, y * (stride + 1) + 1).astype(np.int32)
        if ftype == 0:
            cur = row
        elif ftype == 1:  # sub — cumulative over pixels, wraps mod 256
            cur = row.reshape(-1, ch)
            cur = np.cumsum(cur, axis=0, dtype=np.int32).reshape(-1) & 0xFF
        elif ftype == 2:  # up
            cur = (row + prev) & 0xFF
        elif ftype == 3:  # average
            cur = row.copy()
            for i in range(stride):
                left = cur[i - ch] if i >= ch else 0
                cur[i] = (cur[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # paeth
            cur = row.copy()
            for i in range(stride):
                left = cur[i - ch] if i >= ch else 0
                ul = prev[i - ch] if i >= ch else 0
                cur[i] = (cur[i] + _paeth(int(left), int(prev[i]), int(ul))) & 0xFF
        else:
            raise ValueError(f"PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur.astype(np.int32)
    px = out.reshape(h, w, ch)
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG without PLTE")
        px = plte[px[:, :, 0]]
    return px


def _chunk(ctype: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + ctype + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF))


def png_encode(px: np.ndarray, level: int = 6) -> bytes:
    """(h, w, bands) uint8 → PNG bytes (filter-0 scanlines)."""
    px = np.ascontiguousarray(px, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, bands = px.shape
    if bands not in _COLOR_TYPE:
        raise ValueError(f"unsupported band count {bands}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, _COLOR_TYPE[bands], 0, 0, 0)
    rows = b"".join(b"\x00" + px[y].tobytes() for y in range(h))
    return (_SIG + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(rows, level))
            + _chunk(b"IEND", b""))
