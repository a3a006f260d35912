"""End-to-end pipeline invariants (BASELINE.json:6,15):

* decoded-pixel allclose: decode(engine COG) == decode(input), exactly, for
  the lossless formats (raw/deflate) — full-res imagery AND mask plane;
* overview pixels equal the closed-form 2x-average pyramid;
* deterministic tile order / offsets match the reference order (W1);
* caption round-trips byte-equal through the pipeline join;
* determinism: two runs produce identical blobs.
"""

import zlib

import numpy as np
import pytest
import pyspark.sql.functions as F

from cogger_spark import fixtures
from cogger_spark.functions.imagecodecs import build_pyramid, decode_image, stitch_tiles
from cogger_spark.operators.tiling import (
    cog_pipeline,
    infer_planes,
    tile_images,
    with_data_offsets,
    with_tile_order,
)
from cogger_spark.tiff import parse_tiff
from cogger_spark.tiff.codec import GHOST_MASK, assemble_ifd_tree, tile_order

TILE = 512


@pytest.fixture(scope="module")
def cogs(spark, smoke_images):
    images = spark.read.parquet(smoke_images)
    out = cog_pipeline(images, tile=TILE).collect()
    return {r.image_id: r for r in out}


def _expected_pixels(i):
    w, h = fixtures.image_dims(i, fixtures.SMOKE_DIMS)
    bands = fixtures.n_bands(i)
    mask = fixtures.has_mask(i)
    return fixtures.make_pixels(i, w, h, bands, mask), w, h, bands, mask


def test_all_images_assembled(cogs):
    assert len(cogs) == 50


def test_cog_fullres_pixels_exact(cogs):
    for i in (0, 1, 5, 6, 7, 12):  # gray+mask, rgb, 4band+mask, 1024px, 1px
        row = cogs[f"img_{i:08d}"]
        px, w, h, bands, mask = _expected_pixels(i)
        tf = parse_tiff(bytes(row.cog))
        main = assemble_ifd_tree(tf.ifds)
        assert main.image_width == w and main.image_height == h
        assert main.samples_per_pixel == bands
        assert (main.mask is not None) == mask
        ntx, nty = main.n_tiles_x(), main.n_tiles_y()
        got_tiles = {}
        for ty in range(nty):
            for tx in range(ntx):
                blob = main.load_tile(main.tile_idx(tx, ty, 0))
                got_tiles[(tx, ty)] = decode_image(
                    zlib.decompress(blob), TILE, TILE, "raw", bands)
        got = stitch_tiles(got_tiles, w, h, bands, TILE)
        assert np.array_equal(got, px[:, :, :bands]), f"img {i} pixel mismatch"
        if mask:
            mtiles = {}
            m = main.mask
            for ty in range(nty):
                for tx in range(ntx):
                    blob = m.load_tile(m.tile_idx(tx, ty, 0))
                    mtiles[(tx, ty)] = decode_image(
                        zlib.decompress(blob), TILE, TILE, "raw", 1)
            gotm = stitch_tiles(mtiles, w, h, 1, TILE)
            assert np.array_equal(gotm[:, :, 0], px[:, :, bands])


def test_overview_pixels_match_average_pyramid(cogs):
    for i in (1, 6):  # 257x513 rgb, 1024x256 gray
        row = cogs[f"img_{i:08d}"]
        px, w, h, bands, mask = _expected_pixels(i)
        expected_levels = build_pyramid(px[:, :, :bands].copy(), TILE)
        tf = parse_tiff(bytes(row.cog))
        main = assemble_ifd_tree(tf.ifds)
        assert len(main.overviews) == len(expected_levels) - 1
        for lvl, exp in enumerate(expected_levels[1:], start=1):
            ifd = main.overviews[lvl - 1]
            lh, lw = exp.shape[0], exp.shape[1]
            assert ifd.image_width == lw and ifd.image_height == lh
            tiles = {}
            for ty in range(ifd.n_tiles_y()):
                for tx in range(ifd.n_tiles_x()):
                    blob = ifd.load_tile(ifd.tile_idx(tx, ty, 0))
                    tiles[(tx, ty)] = decode_image(
                        zlib.decompress(blob), TILE, TILE, "raw", bands)
            got = stitch_tiles(tiles, lw, lh, bands, TILE)
            assert np.array_equal(got, exp), f"img {i} level {lvl}"


def test_tile_order_and_offsets_match_reference_semantics(cogs, spark, smoke_images):
    """The DataFrame order key (level DESC, ty, tx, plane) must equal the
    codec's tile_order, and the window prefix-sum offsets must equal the
    offsets the codec assigned inside the written COG."""
    images = spark.read.parquet(smoke_images)
    tiles = with_data_offsets(with_tile_order(tile_images(images, tile=TILE)))
    for i in (0, 6):
        iid = f"img_{i:08d}"
        pdf = (tiles.filter(F.col("image_id") == iid)
               .orderBy("tile_rank")
               .select("level", "plane", "ty", "tx", "byte_count", "data_offset")
               .toPandas())
        row = cogs[iid]
        tf = parse_tiff(bytes(row.cog))
        main = assemble_ifd_tree(tf.ifds)
        # mask plane in parsed tree reports via separate IFD; rebuild the
        # (level, plane, ty, tx) sequence from the codec's own iterator
        order = []
        lvl_of = {id(main): 0}
        for k, o in enumerate(main.overviews):
            lvl_of[id(o)] = k + 1
            if o.mask is not None:
                lvl_of[id(o.mask)] = k + 1
        if main.mask is not None:
            lvl_of[id(main.mask)] = 0
        for ifd, x, y, p in tile_order(main):
            is_mask = ifd.subfile_type & 4 == 4
            order.append((lvl_of[id(ifd)], 1 if is_mask else 0, y, x,
                          ifd.tile_byte_counts[ifd.tile_idx(x, y, p)],
                          ifd.tile_offsets[ifd.tile_idx(x, y, p)]))
        got = list(pdf.itertuples(index=False, name=None))
        assert [g[:4] for g in got] == [o[:4] for o in order], f"{iid} order"
        assert [g[4] for g in got] == [o[4] for o in order], f"{iid} byte counts"
        # window offsets are relative to data start; codec offsets absolute
        data_start = order[0][5]
        assert all(g[5] + data_start == o[5] for g, o in zip(got, order)), \
            f"{iid} offsets"


def test_ghost_area_present(cogs):
    # 4-band planes>1? our tiles are pixel-interleaved (planar=1) so the
    # ghost stays enabled; mask images carry the MASK_INTERLEAVED variant
    row = cogs["img_00000000"]  # gray + mask
    assert bytes(row.cog)[8:8 + len(GHOST_MASK)] == GHOST_MASK


def test_caption_roundtrip(cogs, spark, smoke_images):
    images = spark.read.parquet(smoke_images)
    out = spark.createDataFrame(
        [(k, v.total_bytes) for k, v in cogs.items()],
        "image_id string, total_bytes long")
    joined = images.join(out, "image_id").select("image_id", "caption").collect()
    assert len(joined) == 50
    for r in joined:
        i = int(r.image_id[4:])
        assert r.caption == fixtures.caption(i)


def test_determinism_two_runs(spark, smoke_images, cogs):
    import hashlib
    images = spark.read.parquet(smoke_images)
    second = cog_pipeline(images, tile=TILE).collect()
    for r in second:
        assert hashlib.md5(bytes(r.cog)).hexdigest() == \
            hashlib.md5(bytes(cogs[r.image_id].cog)).hexdigest()


def test_infer_planes():
    assert infer_planes(100 * 50 * 3, 100, 50) == (3, False)
    assert infer_planes(100 * 50 * 2, 100, 50) == (1, True)
    assert infer_planes(100 * 50 * 5, 100, 50) == (4, True)
    assert infer_planes(100 * 50 * 4, 100, 50) == (4, False)


def test_lossy_pipeline_psnr_over_40db(spark, smoke_images):
    """The lossy path (quant6): decoded output is NOT exact, but every image
    meets the per-row PSNR >= 40 dB invariant (BASELINE.json:15)."""
    from cogger_spark.functions.imagecodecs import psnr
    images = spark.read.parquet(smoke_images).limit(6)
    out = cog_pipeline(images, tile=TILE, compression="quant6").collect()
    assert len(out) == 6
    for row in out:
        i = int(row.image_id[4:])
        px, w, h, bands, mask = _expected_pixels(i)
        tf = parse_tiff(bytes(row.cog))
        main = assemble_ifd_tree(tf.ifds)
        tiles = {}
        for ty in range(main.n_tiles_y()):
            for tx in range(main.n_tiles_x()):
                blob = main.load_tile(main.tile_idx(tx, ty, 0))
                tiles[(tx, ty)] = decode_image(
                    zlib.decompress(blob), TILE, TILE, "raw", bands)
        got = stitch_tiles(tiles, w, h, bands, TILE)
        p = psnr(px[:, :, :bands], got)
        assert p >= 40.0, f"{row.image_id}: PSNR {p:.1f} dB"
        assert not (got == px[:, :, :bands]).all() or px.max() < 4
