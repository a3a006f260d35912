"""Decode the reference golden fixtures' LZW tiles and verify their pixel
content in closed form — pinning that our codec reads what the reference
writes, down to pixel values (not just byte layout).

Expected content from the committed generator (testdata/main.go.removeme:
24-56): 128x128 tiles, band b tile (tx,ty) filled with v=(b*10+ty*2+tx)*2,
pixel[i] = v*(i%4) (mod 256); masks are all-255.
"""

import numpy as np
import pathlib
import pytest

from cogger_spark.tiff import parse_tiff, assemble_ifd_tree
from cogger_spark.tiff.lzw import decode_tile

TESTDATA = pathlib.Path("/root/reference/testdata")


def _decode_full(ifd):
    tw, th = ifd.tile_width, ifd.tile_height
    samples = ifd.samples_per_pixel if ifd.planar_configuration != 2 else 1
    ntx, nty = ifd.n_tiles_x(), ifd.n_tiles_y()
    planes = ifd.n_planes()
    out = np.zeros((planes, ifd.image_height, ifd.image_width, samples), np.uint8)
    for p in range(planes):
        for ty in range(nty):
            for tx in range(ntx):
                payload = ifd.load_tile(ifd.tile_idx(tx, ty, p))
                raw = decode_tile(payload, ifd.compression, ifd.predictor,
                                  tw, th, samples)
                block = np.frombuffer(raw, np.uint8).reshape(th, tw, samples)
                y0, x0 = ty * th, tx * tw
                h = min(th, ifd.image_height - y0)
                w = min(tw, ifd.image_width - x0)
                out[p, y0:y0 + h, x0:x0 + w] = block[:h, :w]
    return out


@pytest.mark.parametrize("name,bands,planar", [
    ("gray.tif", 1, False),
    ("rgb.tif", 3, False),
    ("band4.tif", 4, True),
])
def test_golden_fullres_pixels_closed_form(name, bands, planar):
    tf = parse_tiff((TESTDATA / name).read_bytes())
    main = assemble_ifd_tree(tf.ifds)
    px = _decode_full(main)
    i = np.arange(128 * 128, dtype=np.uint32).reshape(128, 128) % 4
    for b in range(bands):
        for ty in range(2):
            for tx in range(2):
                v = (b * 10 + ty * 2 + tx) * 2
                expected = ((v * i) & 0xFF).astype(np.uint8)
                if planar:
                    got = px[b, ty * 128:(ty + 1) * 128, tx * 128:(tx + 1) * 128, 0]
                else:
                    got = px[0, ty * 128:(ty + 1) * 128, tx * 128:(tx + 1) * 128, b]
                assert np.array_equal(got, expected), (name, b, tx, ty)


def test_golden_mask_is_all_valid():
    tf = parse_tiff((TESTDATA / "graymask.tif").read_bytes())
    main = assemble_ifd_tree(tf.ifds)
    assert main.mask is not None
    m = main.mask
    payload = m.load_tile(0)
    raw = decode_tile(payload, m.compression, m.predictor,
                      m.tile_width, m.tile_height, 1)
    # 1-bit mask: all-valid == all bytes 0xFF
    assert set(raw[: (m.tile_width // 8) * m.tile_height]) == {0xFF}
