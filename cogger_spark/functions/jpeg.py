"""Pure-Python baseline JPEG decoder (ITU-T T.81) — un-stubs the `jpeg`
image format with no external library.

Scope: baseline sequential DCT (SOF0), Huffman entropy coding with byte
stuffing and restart markers, 8-bit samples, 1- or 3-component scans, any
chroma subsampling the sampling factors describe (4:4:4 / 4:2:2 / 4:2:0 …),
JFIF full-range YCbCr→RGB. Progressive (SOF2) and arithmetic coding raise.

Decode only: JPEG is lossy, so the engine never *produces* it (parity with
the reference, which re-emits input tiles byte-transparently). Validation
(tests/test_jpeg.py) uses javax.imageio inside Spark's JVM as the oracle:
ImageIO-encoded JPEGs must decode here within the north rule's PSNR >= 40 dB
of ImageIO's own decode of the same bytes — both implement the same
standard; the residual is IDCT rounding + chroma upsampling choice.
"""

from __future__ import annotations

import struct

import numpy as np

ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int32)

# separable IDCT basis: B[u, x] = c(u)/2 * cos((2x+1) u pi / 16)
_B = np.array([[(0.35355339059327373 if u == 0 else 0.5)
                * np.cos((2 * x + 1) * u * np.pi / 16)
                for x in range(8)] for u in range(8)])


def _idct2(block: np.ndarray) -> np.ndarray:
    return _B.T @ block @ _B


class _HuffTable:
    """Canonical Huffman table as (maxcode per length, value lookup)."""

    def __init__(self, counts: list[int], values: bytes):
        self.lookup = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lookup[(length, code)] = values[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over the entropy-coded segment with 0xFF00
    byte-unstuffing; stops at markers (RSTn handled by the caller)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                self.acc = (self.acc << 8) & 0xFFFFFFFF
                self.nbits += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 2
                else:  # a real marker: pad with zeros, caller handles it
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
        out = 0
        for _ in range(n):
            out = (out << 1) | self.read_bit()
        return out

    def decode(self, table: _HuffTable) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            v = table.lookup.get((length, code))
            if v is not None:
                return v
        raise ValueError("jpeg: invalid Huffman code")

    def align(self):
        self.nbits = 0
        self.acc = 0

    def sync_restart(self):
        """Skip to just past the next RSTn marker."""
        self.align()
        d = self.data
        p = self.pos
        while p + 1 < len(d):
            if d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7:
                self.pos = p + 2
                return
            p += 1
        raise ValueError("jpeg: expected restart marker")


def _extend(v: int, t: int) -> int:
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


def jpeg_decode(data: bytes) -> np.ndarray:
    """JPEG bytes → (h, w, bands) uint8 (bands 1 or 3)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    frame = None
    restart_interval = 0
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"jpeg: bad marker alignment at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        length = struct.unpack(">H", data[pos:pos + 2])[0]
        body = data[pos + 2:pos + length]
        if marker == 0xDB:  # DQT
            b = 0
            while b < len(body):
                prec, tid = body[b] >> 4, body[b] & 15
                b += 1
                if prec:
                    tbl = np.frombuffer(body, ">u2", 64, b).astype(np.int32)
                    b += 128
                else:
                    tbl = np.frombuffer(body, np.uint8, 64, b).astype(np.int32)
                    b += 64
                qt[tid] = tbl
        elif marker == 0xC0:  # SOF0 baseline
            prec, h, w, nc = body[0], *struct.unpack(">HH", body[1:5]), body[5]
            comps = []
            for i in range(nc):
                cid, sf, tq = body[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "hs": sf >> 4, "vs": sf & 15,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"jpeg: only baseline SOF0 supported (got SOF {marker:#x})")
        elif marker == 0xC4:  # DHT
            b = 0
            while b < len(body):
                cls, tid = body[b] >> 4, body[b] & 15
                counts = list(body[b + 1:b + 17])
                n = sum(counts)
                vals = body[b + 17:b + 17 + n]
                (huff_ac if cls else huff_dc)[tid] = _HuffTable(counts, vals)
                b += 17 + n
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker == 0xDA:  # SOS — decode the scan
            if frame is None:
                raise ValueError("jpeg: SOS before SOF0")
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tt = body[1 + 2 * i], body[2 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append((comp, tt >> 4, tt & 15))
            return _decode_scan(data, pos + length, frame, scan, qt,
                                huff_dc, huff_ac, restart_interval)
        pos += length
    raise ValueError("jpeg: no scan found")


def _decode_scan(data, pos, frame, scan, qt, huff_dc, huff_ac,
                 restart_interval) -> np.ndarray:
    h, w = frame["h"], frame["w"]
    comps = [c for c, _, _ in scan]
    if len(scan) == 1:
        # T.81 single-component scans are NON-interleaved: one 8x8 data unit
        # per MCU in raster order, whatever the SOF sampling factors say
        comps = [dict(comps[0], hs=1, vs=1)]
        scan = [(comps[0], scan[0][1], scan[0][2])]
    hmax = max(c["hs"] for c in comps)
    vmax = max(c["vs"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for c in comps:
        planes.append(np.zeros((mcuy * c["vs"] * 8, mcux * c["hs"] * 8),
                               np.float64))
    reader = _BitReader(data, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                reader.sync_restart()
                pred = [0] * len(comps)
            for ci, (c, td, ta) in enumerate(scan):
                q = qt[c["tq"]]
                for by in range(c["vs"]):
                    for bx in range(c["hs"]):
                        coefs = np.zeros(64, np.int32)
                        t = reader.decode(huff_dc[td])
                        diff = _extend(reader.read_bits(t), t) if t else 0
                        pred[ci] += diff
                        coefs[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = reader.decode(huff_ac[ta])
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("jpeg: AC index overflow")
                            coefs[k] = _extend(reader.read_bits(s), s)
                            k += 1
                        block = np.zeros(64, np.float64)
                        block[ZIGZAG] = (coefs * q).astype(np.float64)
                        px = _idct2(block.reshape(8, 8)) + 128.0
                        y0 = (my * c["vs"] + by) * 8
                        x0 = (mx * c["hs"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = px
            mcu_count += 1
    # upsample each plane to full MCU-aligned resolution, then crop.
    # 2x steps use the triangle filter (libjpeg's "fancy upsampling":
    # out[2i] = (3*c[i] + c[i-1]) / 4, out[2i+1] = (3*c[i] + c[i+1]) / 4,
    # edges replicated) — nearest-neighbor costs ~2.5 dB on smooth chroma
    def _up2(p: np.ndarray, axis: int) -> np.ndarray:
        p = np.moveaxis(p, axis, 0)
        prev = np.concatenate([p[:1], p[:-1]], axis=0)
        nxt = np.concatenate([p[1:], p[-1:]], axis=0)
        out = np.empty((2 * p.shape[0],) + p.shape[1:], p.dtype)
        out[0::2] = 0.75 * p + 0.25 * prev
        out[1::2] = 0.75 * p + 0.25 * nxt
        return np.moveaxis(out, 0, axis)

    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        ry, rx = vmax // c["vs"], hmax // c["hs"]
        while ry > 1:
            p = _up2(p, 0) if ry % 2 == 0 else np.repeat(p, ry, axis=0)
            ry = ry // 2 if ry % 2 == 0 else 1
        while rx > 1:
            p = _up2(p, 1) if rx % 2 == 0 else np.repeat(p, rx, axis=1)
            rx = rx // 2 if rx % 2 == 0 else 1
        full.append(p[:h, :w])
    if len(full) == 1:
        out = full[0][:, :, None]
    else:
        y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        b = y + 1.772 * cb
        out = np.stack([r, g, b], axis=2)
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)
