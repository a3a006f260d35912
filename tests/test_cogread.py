"""COG reader operators: thumbnails decode only the deepest level, header
audit confirms metadata-first layout, tile fetches equal the original
payloads — the consumer-side contract of the format."""

import numpy as np
import pytest

from cogger_spark import fixtures
from cogger_spark.functions.imagecodecs import build_pyramid
from cogger_spark.operators.cogread import (
    extract_thumbnails, fetch_tiles, read_cog_headers)
from cogger_spark.operators.tiling import cog_pipeline, tile_images


@pytest.fixture(scope="module")
def cog_df(spark, smoke_images):
    images = spark.read.parquet(smoke_images).limit(10)
    return cog_pipeline(images, tile=512).cache()


def test_headers_metadata_first(spark, cog_df):
    rows = read_cog_headers(cog_df).collect()
    assert len(rows) == 10
    for r in rows:
        # header (everything before the first tile) is a small prefix —
        # the single-range-read property (LAYOUT=IFDS_BEFORE_DATA)
        assert 0 < r.data_start
        assert r.header_frac < 0.25, (r.image_id, r.header_frac)
        assert r.n_levels >= 1


def test_thumbnails_equal_deepest_pyramid_level(spark, cog_df):
    rows = {r.image_id: r for r in extract_thumbnails(cog_df).collect()}
    for iid, r in rows.items():
        i = int(iid[4:])
        w, h = fixtures.image_dims(i, fixtures.SMOKE_DIMS)
        bands = fixtures.n_bands(i)
        px = fixtures.make_pixels(i, w, h, bands, fixtures.has_mask(i))
        deepest = build_pyramid(px[:, :, :bands].copy(), 512)[-1]
        got = np.frombuffer(bytes(r.thumb), np.uint8).reshape(r.th, r.tw, r.bands)
        assert got.shape == deepest.shape, iid
        assert np.array_equal(got, deepest), iid


def test_fetch_tiles_returns_original_payloads(spark, cog_df, smoke_images):
    images = spark.read.parquet(smoke_images).limit(10)
    tiles = tile_images(images, tile=512)
    originals = {(r.image_id, r.level, r.ty, r.tx): bytes(r.payload)
                 for r in tiles.filter("plane = 0").collect()}
    req_rows = [(iid, lvl, ty, tx) for (iid, lvl, ty, tx) in list(originals)[:40]]
    requests = spark.createDataFrame(
        req_rows, "image_id string, level int, ty int, tx int")
    got = fetch_tiles(cog_df, requests).collect()
    assert len(got) == len(req_rows)
    for r in got:
        assert bytes(r.payload) == originals[(r.image_id, r.level, r.ty, r.tx)]
