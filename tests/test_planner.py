"""Planner unit tests — direct ports of the reference tables
(stripper_test.go:14-73) plus DAG and tile→strip routing checks."""

import pytest

from cogger_spark.planner import Stripper, pyramid_dag, tile_strip_idx


@pytest.mark.parametrize("w,h,expected_levels", [
    (300, 300, 1),
    (299, 299, 1),
    (301, 301, 2),
    (300, 301, 2),
    (301, 300, 2),
    (301, 4, 2),
    (301, 3, 1),
    (301, 2, 1),
    (4, 301, 2),
    (3, 301, 1),
    (2, 301, 1),
])
def test_stripper_overviews(w, h, expected_levels):
    # stripper_test.go:14-39 — InternalTileSize(300,300), MinOverviewSize(3)
    s = Stripper(w, h, tile_width=300, tile_height=300, min_overview_size=3)
    assert len(s.pyramid()) == expected_levels


@pytest.mark.parametrize("w,h,tilesize,target,mult,heights", [
    (256, 256, 256, 1024 * 1024, 256, [256.0]),
    (256, 256, 256, 1024 * 1024, 512, [256.0]),
    (256, 1024, 256, 1024 * 1024, 512, [1024.0]),
    (256, 1024, 256, 256 * 256, 512, [512.0, 512.0]),
    (256, 1025, 256, 256 * 256, 512, [512.0, 513.0]),
    (256, 1023, 256, 256 * 256, 512, [512.0, 511.0]),
    (256, 1024, 256, 256 * 256, 768, [768.0, 256.0]),
    (256, 1025, 256, 256 * 256, 768, [768.0, 257.0]),
    (256, 1023, 256, 256 * 256, 768, [1023.0]),
])
def test_fullres_strip_height_multiple(w, h, tilesize, target, mult, heights):
    # stripper_test.go:41-73
    s = Stripper(w, h, tile_width=tilesize, tile_height=tilesize,
                 target_pixel_count=target, fullres_strip_height_multiple=mult)
    strips = s.pyramid()[0].strips
    assert [st.src_height for st in strips] == heights


def test_tile_strip_routing():
    # 256x1025 with 512-high strips → fullres strips of 512/513 rows;
    # tile rows 0,1 in strip 0; rows 2,3,4 in strip 1.
    s = Stripper(256, 1025, tile_width=256, tile_height=256,
                 target_pixel_count=256 * 256, fullres_strip_height_multiple=512)
    img = s.pyramid()[0]
    assert tile_strip_idx(img, 0, 0) == (0, 0, 0)
    assert tile_strip_idx(img, 0, 1) == (0, 0, 1)
    assert tile_strip_idx(img, 0, 2) == (1, 0, 0)
    assert tile_strip_idx(img, 0, 4) == (1, 0, 2)


def test_dag_parents_cover_source_window():
    s = Stripper(1000, 4000, tile_width=256, tile_height=256,
                 target_pixel_count=512 * 512)
    pyr = s.pyramid()
    dag = pyramid_dag(pyr)
    assert all(n["parents"] == [] for n in dag[0])
    for level in range(1, len(pyr)):
        heights = [st.height for st in pyr[level - 1].strips]
        cum = [0]
        for h in heights:
            cum.append(cum[-1] + h)
        for si, strip in enumerate(pyr[level].strips):
            node = dag[level][si]
            top = int(strip.src_top_left_y)
            bottom = strip.src_top_left_y + strip.src_height
            covered_top = cum[node["parents"][0]]
            covered_bottom = cum[node["parents"][-1] + 1]
            assert covered_top <= top
            assert covered_bottom >= bottom - 1
            assert node["parent_offset"] == covered_top


def test_strip_heights_sum_to_image():
    for w, h in [(12345, 23456), (512, 512), (1, 1025), (511, 1)]:
        s = Stripper(w, h, target_pixel_count=1024 * 1024)
        for img in s.pyramid():
            assert sum(st.height for st in img.strips) == img.height
            assert all(st.width == img.width for st in img.strips)


def test_non_square_internal_tiles_strip_mapping():
    """InternalTileSize(w != h) (stripper.go:46-62): the planned Image must
    carry the true tile WIDTH so tile→strip x-mapping divides by width, not
    height (r5 latent-defect fix: tile_width was stamped from tile_h)."""
    from cogger_spark.planner.pyramid import Stripper, tile_strip_idx
    s = Stripper(2048, 1024, tile_width=512, tile_height=256,
                 target_pixel_count=512 * 1024, overview_count=0)
    img = s.pyramid()[0]
    assert img.tile_width == 512 and img.tile_height == 256
    # level 0 is 2048 px wide -> 4 tile columns of width 512
    strip, sx, sy = tile_strip_idx(img, 3, 0)
    assert sx == 3  # x % ntx with ntx = ceil(2048/512) = 4
    # with the old tile_h-stamped width, ntx would be ceil(2048/256) = 8
    # and the mapping of x=5 would differ; ensure ntx derives from width
    ntx = (img.strips[0].width + img.tile_width - 1) // img.tile_width
    assert ntx == 4
