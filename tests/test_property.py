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


# ---------------------------------------------------------------------------
# cell index (functions/cells.py) — the H3/S2-role quadtree grid
# ---------------------------------------------------------------------------

from cogger_spark.functions import cells  # noqa: E402

_lons = st.floats(min_value=-180.0, max_value=180.0,
                  allow_nan=False, allow_infinity=False)
_lats = st.floats(min_value=-90.0, max_value=90.0,
                  allow_nan=False, allow_infinity=False)


@given(lon=_lons, lat=_lats, res=st.integers(min_value=0, max_value=28))
@settings(max_examples=60, deadline=None)
def test_cell_encode_decode_identity(lon, lat, res):
    """Encoded cells decode to in-grid (x, y, res), and re-packing those
    coordinates is the identity — for the whole lon/lat domain including
    the +180/+90 clamp edge."""
    c = cells.cell_encode(np.array([lon]), np.array([lat]), res)
    x, y, r = cells.xy_from_cell(c)
    assert int(r[0]) == res
    assert 0 <= int(x[0]) < (1 << res) or res == 0
    assert 0 <= int(y[0]) < (1 << res) or res == 0
    assert cells.cell_from_xy(x, y, res)[0] == c[0]


@given(lon=_lons, lat=_lats,
       r_child=st.integers(min_value=1, max_value=28),
       up=st.integers(min_value=0, max_value=10))
@settings(max_examples=60, deadline=None)
def test_cell_parent_equals_direct_encode(lon, lat, r_child, up):
    """Hierarchy consistency: the parent of a child cell equals encoding
    the point directly at the parent resolution (floor-composition of the
    quantizer — holds at the clamped +180/+90 border too)."""
    r_parent = max(0, r_child - up)
    child = cells.cell_encode(np.array([lon]), np.array([lat]), r_child)
    parent = cells.cell_parent(child, r_parent)
    direct = cells.cell_encode(np.array([lon]), np.array([lat]), r_parent)
    assert parent[0] == direct[0]


@given(lon=_lons, lat=_lats, res=st.integers(min_value=2, max_value=24),
       k=st.integers(min_value=1, max_value=3))
@settings(max_examples=60, deadline=None)
def test_k_ring_membership_and_chebyshev_bound(lon, lat, res, k):
    """k_ring contains the center, stays at one resolution, and every
    neighbor is within Chebyshev distance k (clamping only shrinks the
    distance)."""
    c = cells.cell_encode(np.array([lon]), np.array([lat]), res)
    ring = cells.k_ring(c, k)
    side = 2 * k + 1
    assert ring.shape == (1, side * side)
    vals = ring[0]
    assert c[0] in set(vals.tolist())
    xs, ys, rs = cells.xy_from_cell(vals)
    x0, y0, _ = cells.xy_from_cell(c)
    assert (rs == res).all()
    assert (np.abs(xs.astype(np.int64) - int(x0[0])) <= k).all()
    assert (np.abs(ys.astype(np.int64) - int(y0[0])) <= k).all()


@given(lon_a=_lons, lat_a=_lats, lon_b=_lons, lat_b=_lats,
       lon_p=st.floats(0.0, 1.0, allow_nan=False),
       lat_p=st.floats(0.0, 1.0, allow_nan=False),
       res=st.integers(min_value=0, max_value=12))
@settings(max_examples=60, deadline=None)
def test_cover_bbox_contains_every_inner_point(lon_a, lat_a, lon_b, lat_b,
                                               lon_p, lat_p, res):
    """Soundness of the spatial-join cover: ANY point inside the bbox
    (parameterized by interpolation so hypothesis can hit edges with
    lon_p/lat_p of exactly 0.0/1.0) encodes to a cell in cover_bbox — the
    guarantee the cell equi-joins rely on before exact refinement."""
    lon_min, lon_max = sorted((lon_a, lon_b))
    lat_min, lat_max = sorted((lat_a, lat_b))
    lon = lon_min + lon_p * (lon_max - lon_min)
    lat = lat_min + lat_p * (lat_max - lat_min)
    cover = cells.cover_bbox(np.array([lon_min]), np.array([lat_min]),
                             np.array([lon_max]), np.array([lat_max]), res)
    c = cells.cell_encode(np.array([lon]), np.array([lat]), res)
    assert c[0] in set(np.asarray(cover[0]).tolist())
