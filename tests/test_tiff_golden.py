"""Golden-file parity: re-emit the reference fixtures byte-identically.

Mirrors cogger_test.go:14-66 — md5(rewrite(inputs)) must equal the committed
expected COG. This pins tile ordering, offset assignment, ghost areas, tag
wire format, and planar/mask interleaving in one shot.
"""

import hashlib
import pathlib

import pytest

from cogger_spark.tiff import parse_tiff, rewrite

TESTDATA = pathlib.Path("/root/reference/testdata")

SINGLE_CASES = [
    "band4mask.tif",
    "band4.tif",
    "graymask.tif",
    "gray.tif",
    "rgbmask.tif",
    "rgbmaskline.tif",
    "rgb.tif",
]


def _md5(b: bytes) -> str:
    return hashlib.md5(b).hexdigest()


@pytest.mark.parametrize("name", SINGLE_CASES)
def test_single_file_golden(name):
    src = (TESTDATA / name).read_bytes()
    expected = (TESTDATA / f"cog_{name}").read_bytes()
    out = rewrite(src)
    assert len(out) == len(expected), (
        f"{name}: length {len(out)} != {len(expected)}")
    assert _md5(out) == _md5(expected), f"{name}: byte mismatch"


def test_multi_file_ovr():
    srcs = [(TESTDATA / n).read_bytes() for n in ("exttest.tif", "exttest.tif.ovr")]
    expected = (TESTDATA / "cog_ext_ovr.tif").read_bytes()
    assert _md5(rewrite(*srcs)) == _md5(expected)


def test_multi_file_multi():
    srcs = [(TESTDATA / n).read_bytes()
            for n in ("exttest.tif", "exttest.tif.2", "exttest.tif.4")]
    expected = (TESTDATA / "cog_ext_multi.tif").read_bytes()
    assert _md5(rewrite(*srcs)) == _md5(expected)


def test_output_is_parseable_cog():
    """Round-trip: our writer's output parses back with consistent grids."""
    out = rewrite((TESTDATA / "rgb.tif").read_bytes())
    tf = parse_tiff(out)
    assert tf.ifds, "no IFDs parsed back"
    main = tf.ifds[0]
    assert main.subfile_type == 0
    assert main.image_width == 256 and main.image_height == 256
    n = main.n_tiles_x() * main.n_tiles_y() * main.n_planes()
    assert len(main.tile_offsets) == n


@pytest.mark.parametrize("name", SINGLE_CASES)
def test_rewrite_split_golden(name):
    """RewriteSplitted parity (loader.go:67, cog.go:765-780): header + data
    concatenated equals the committed golden COG byte-for-byte."""
    from cogger_spark.tiff.codec import rewrite_split
    src = (TESTDATA / name).read_bytes()
    expected = (TESTDATA / f"cog_{name}").read_bytes()
    header, data = rewrite_split(src)
    assert _md5(header + data) == _md5(expected), f"{name}: split mismatch"
    assert len(header) > 0 and len(data) > 0


def test_rewrite_tiffs_split_operator(spark):
    """Spark-side split rewrite: header||data equals the whole-blob column
    for the golden fixtures routed through the operator."""
    from cogger_spark.operators.tiling import rewrite_tiffs
    rows = [(n, (TESTDATA / n).read_bytes()) for n in SINGLE_CASES[:3]]
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    whole = {r.image_id: bytes(r.cog)
             for r in rewrite_tiffs(df).collect()}
    split = {r.image_id: (bytes(r.header), bytes(r.data), r.out_bytes)
             for r in rewrite_tiffs(df, split=True).collect()}
    assert set(whole) == set(split)
    for iid, (h, d, ob) in split.items():
        assert h + d == whole[iid]
        assert ob == len(whole[iid])


def test_jpeg_in_tiff_rewrite_fixed_point(spark):
    """Compression-7 (JPEG-in-TIFF) with a shared JPEGTables tag (347):
    build a tiled TIFF whose tile payloads are javax.imageio-encoded JPEG
    streams and whose tag 347 carries the abbreviated tables stream, then
    assert parse→rewrite is a byte-identical fixed point — the tag-347
    encoder path (tiff/codec.py, field kind 'bytes') was previously
    golden-untested (VERDICT r3 #7). The rewrite path is payload-opaque, so
    payload bytes must also survive exactly."""
    import struct as _s

    import numpy as np

    from cogger_spark.tiff.codec import IFD, rewrite_ifd_tree

    jvm = spark._jvm
    gateway = spark.sparkContext._gateway

    def encode_rgb(px):
        h, w = px.shape[:2]
        img = jvm.java.awt.image.BufferedImage(w, h, 1)
        argb = ((px[:, :, 0].astype(np.int64) << 16)
                | (px[:, :, 1].astype(np.int64) << 8)
                | px[:, :, 2].astype(np.int64)) | (0xFF << 24)
        arr = gateway.new_array(jvm.int, h * w)
        flat = argb.reshape(-1)
        for i in range(h * w):
            v = int(flat[i])
            arr[i] = v - (1 << 32) if v >= (1 << 31) else v
        img.setRGB(0, 0, w, h, arr, 0, w)
        bos = jvm.java.io.ByteArrayOutputStream()
        assert jvm.javax.imageio.ImageIO.write(img, "jpg", bos)
        return bytes(bos.toByteArray())

    y, x = np.mgrid[0:128, 0:128]
    payloads = []
    for ty in range(2):
        for tx in range(2):
            r = np.clip(127 + 80 * np.sin((x + 37 * tx) / 17.0), 0, 255)
            g = np.clip(127 + 60 * np.cos((y + 53 * ty) / 11.0), 0, 255)
            b = np.clip(127 + 40 * np.sin((x + y) / 23.0), 0, 255)
            payloads.append(encode_rgb(
                np.stack([r, g, b], axis=2).astype(np.uint8)))

    # abbreviated-tables stream (T.81 B.5): SOI + the DQT/DHT segments of
    # one encoded tile + EOI — what libtiff stores in tag 347
    src = payloads[0]
    tables = bytearray(b"\xff\xd8")
    i = 2
    while i + 4 <= len(src):
        marker, seg_len = src[i + 1], _s.unpack(">H", src[i + 2:i + 4])[0]
        if marker in (0xDB, 0xC4):
            tables += src[i:i + 2 + seg_len]
        if marker == 0xDA:
            break
        i += 2 + seg_len
    tables += b"\xff\xd9"

    main = IFD(subfile_type=0, image_width=256, image_height=256,
               bits_per_sample=(8, 8, 8), compression=7, photometric=6,
               samples_per_pixel=3, tile_width=128, tile_height=128,
               tile_byte_counts=tuple(len(p) for p in payloads),
               jpeg_tables=bytes(tables),
               load_tile=lambda idx: payloads[idx])

    out1 = rewrite_ifd_tree(main)
    parsed = parse_tiff(out1)
    p_main = parsed.ifds[0]
    assert p_main.compression == 7
    assert p_main.jpeg_tables == bytes(tables), "tag 347 did not round-trip"
    for idx in range(4):
        assert p_main.load_tile(idx) == payloads[idx], f"tile {idx} payload"
    out2 = rewrite(out1)
    assert _md5(out2) == _md5(out1), "parse→rewrite is not a fixed point"
