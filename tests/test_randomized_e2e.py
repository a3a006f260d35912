"""Randomized differential test: arbitrary image shapes and random pixel
content through the full Spark pipeline, decoded back and compared
pixel-exact — dims far off the fixture cycles (prime sizes, extreme aspect
ratios, 1px edges). Seeded, deterministic."""

import zlib

import numpy as np
import pytest

from cogger_spark.functions.imagecodecs import build_pyramid, decode_image, stitch_tiles
from cogger_spark.operators.tiling import cog_pipeline
from cogger_spark.tiff import parse_tiff
from cogger_spark.tiff.codec import assemble_ifd_tree

TILE = 512

SHAPES = [
    (515, 2, 1, False), (2, 515, 3, False), (1023, 1025, 4, True),
    (640, 7, 1, True), (997, 499, 3, False), (512, 512, 4, False),
    (1, 777, 1, False), (129, 1279, 4, True),
]


@pytest.fixture(scope="module")
def random_images(spark):
    rng = np.random.RandomState(20260816)
    rows = []
    pixels = {}
    for i, (w, h, bands, mask) in enumerate(SHAPES):
        total = bands + (1 if mask else 0)
        px = rng.randint(0, 256, size=(h, w, total), dtype=np.uint8)
        if mask:
            px[:, :, bands] = 255 * (rng.rand(h, w) > 0.3)
        iid = f"img_{i:08d}"
        pixels[iid] = px
        fmt = "deflate" if i % 2 == 0 else "raw"
        data = zlib.compress(px.tobytes(), 1) if fmt == "deflate" else px.tobytes()
        rows.append((iid, data, w, h, fmt))
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string")
    return df, pixels


def test_random_shapes_roundtrip_exact(spark, random_images):
    df, pixels = random_images
    out = {r.image_id: r for r in cog_pipeline(df, tile=TILE).collect()}
    assert len(out) == len(SHAPES)
    for i, (w, h, bands, mask) in enumerate(SHAPES):
        iid = f"img_{i:08d}"
        px = pixels[iid]
        main = assemble_ifd_tree(parse_tiff(bytes(out[iid].cog)).ifds)
        assert (main.image_width, main.image_height) == (w, h)
        assert main.samples_per_pixel == bands
        assert (main.mask is not None) == mask
        # full-res imagery exact
        tiles = {}
        for ty in range(main.n_tiles_y()):
            for tx in range(main.n_tiles_x()):
                blob = main.load_tile(main.tile_idx(tx, ty, 0))
                tiles[(tx, ty)] = decode_image(
                    zlib.decompress(blob), TILE, TILE, "raw", bands)
        got = stitch_tiles(tiles, w, h, bands, TILE)
        assert np.array_equal(got, px[:, :, :bands]), iid
        # overview count matches the rule; deepest overview pixels exact
        expected = build_pyramid(px[:, :, :bands].copy(), TILE)
        assert len(main.overviews) == len(expected) - 1, iid
        if main.overviews:
            ifd = main.overviews[-1]
            exp = expected[-1]
            t2 = {}
            for ty in range(ifd.n_tiles_y()):
                for tx in range(ifd.n_tiles_x()):
                    blob = ifd.load_tile(ifd.tile_idx(tx, ty, 0))
                    t2[(tx, ty)] = decode_image(
                        zlib.decompress(blob), TILE, TILE, "raw", bands)
            got2 = stitch_tiles(t2, exp.shape[1], exp.shape[0], bands, TILE)
            assert np.array_equal(got2, exp), f"{iid} deepest overview"
