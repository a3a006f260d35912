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
