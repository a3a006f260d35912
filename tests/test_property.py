"""Property-based tests (hypothesis) over the pure-Python core — the codec,
grid math, planner, and downsampling hold their invariants for arbitrary
shapes, not just the fixture dims. (The reference has no property tests —
SURVEY.md §5; these pin the semantics against whole input classes.)"""

import struct

import numpy as np
from hypothesis import given, settings, strategies as st

from cogger_spark.functions.imagecodecs import downsample2x
from cogger_spark.planner import Stripper, tile_strip_idx
from cogger_spark.tiff import IFD, Config, parse_tiff, rewrite_ifd_tree, tile_order
from cogger_spark.tiff.codec import _Writer

dims = st.integers(min_value=1, max_value=700)
tiles = st.sampled_from([16, 32, 64, 100, 256])


def _make_ifd(w, h, tile, planes=1, planar=False, seed=1):
    ntx, nty = -(-w // tile), -(-h // tile)
    n = ntx * nty * (planes if planar else 1)
    rng = np.random.RandomState(seed)
    tbc = [int(v) for v in rng.randint(1, 50, size=n)]
    # sprinkle sparse tiles (byte count 0 → elided, offset 0)
    for i in range(0, n, 7):
        tbc[i] = 0
    blobs = [bytes([i % 251]) * c for i, c in enumerate(tbc)]
    ifd = IFD(image_width=w, image_height=h, bits_per_sample=(8,) * planes,
              compression=1, photometric=1, samples_per_pixel=planes,
              planar_configuration=2 if planar else 1,
              tile_width=tile, tile_height=tile,
              tile_byte_counts=tuple(tbc), tile_offsets=tuple([0] * n))
    ifd.load_tile = lambda idx, _b=blobs: _b[idx]
    return ifd


@given(w=dims, h=dims, tile=tiles)
@settings(max_examples=40, deadline=None)
def test_tile_order_is_a_permutation(w, h, tile):
    ifd = _make_ifd(w, h, tile)
    seen = [ifd.tile_idx(x, y, p) for _, x, y, p in tile_order(ifd)]
    assert sorted(seen) == list(range(len(ifd.tile_byte_counts)))


@given(w=dims, h=dims, tile=tiles)
@settings(max_examples=30, deadline=None)
def test_offsets_monotone_and_non_overlapping(w, h, tile):
    ifd = _make_ifd(w, h, tile)
    writer = _Writer(ifd, Config(with_gdal_ghost=True))
    writer.header()
    prev_end = None
    for _, x, y, p in tile_order(ifd):
        idx = ifd.tile_idx(x, y, p)
        bc = ifd.tile_byte_counts[idx]
        off = ifd.new_tile_offsets[idx]
        if bc == 0:
            assert off == 0  # sparse elision (cog.go:592-594)
            continue
        if prev_end is not None:
            assert off >= prev_end, "tiles overlap"
        prev_end = off + bc + 4  # trailer ghost
    # header must end before the first tile's leader (skip all-sparse images)
    positive = [o for o in ifd.new_tile_offsets if o > 0]
    if positive:
        assert len(writer.header()) <= min(positive) - 4


@given(w=dims, h=dims, tile=tiles)
@settings(max_examples=25, deadline=None)
def test_write_parse_roundtrip(w, h, tile):
    ifd = _make_ifd(w, h, tile)
    blob = rewrite_ifd_tree(ifd, Config(with_gdal_ghost=False))
    back = parse_tiff(blob).ifds[0]
    assert back.image_width == w and back.image_height == h
    assert back.tile_width == tile and back.tile_height == tile
    assert back.tile_byte_counts == ifd.tile_byte_counts
    # payloads readable at their offsets
    for idx, (off, bc) in enumerate(zip(back.tile_offsets, back.tile_byte_counts)):
        if bc:
            assert blob[off:off + bc] == bytes([idx % 251]) * bc


@given(w=dims, h=dims, b=st.integers(1, 4))
@settings(max_examples=25, deadline=None)
def test_downsample_dims_and_range(w, h, b):
    rng = np.random.RandomState(w * 1000 + h)
    px = rng.randint(0, 256, size=(h, w, b), dtype=np.uint8)
    out = downsample2x(px)
    assert out.shape == (-(-h // 2), -(-w // 2), b)
    # each output pixel lies within [min, max] of its source block (+rounding)
    assert out.min() >= px.min() and out.max() <= min(255, px.max() + 1)


@given(w=st.integers(1, 3000), h=st.integers(1, 3000),
       target=st.sampled_from([64 * 64, 256 * 256, 512 * 512]))
@settings(max_examples=40, deadline=None)
def test_planner_partitions_exactly(w, h, target):
    s = Stripper(w, h, tile_width=64, tile_height=64, target_pixel_count=target)
    for img in s.pyramid():
        assert sum(st_.height for st_ in img.strips) == img.height
        # every tile routes to exactly one strip, with consistent local coords
        nty = -(-img.height // 64)
        covered = 0
        for ty in range(nty):
            strip, sx, sy = tile_strip_idx(img, 0, ty)
            srows = (img.strips[strip].height + 63) // 64
            assert 0 <= sy < srows
            covered += 1
        assert covered == nty


@given(w=dims, h=dims)
@settings(max_examples=20, deadline=None)
def test_bigtiff_forced_parses(w, h):
    ifd = _make_ifd(w, h, 64)
    blob = rewrite_ifd_tree(ifd, Config(big_tiff=True, with_gdal_ghost=False))
    assert struct.unpack("<H", blob[2:4])[0] == 43
    back = parse_tiff(blob).ifds[0]
    assert back.tile_byte_counts == ifd.tile_byte_counts
