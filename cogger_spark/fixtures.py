"""Deterministic synthetic fixtures: the image+caption table (input_hint
shape), point geometries, and zone polygons (FIXTURES.md).

Written with pyarrow directly (single files, stable bytes) so the DuckDB
oracle and the Spark engine read the exact same parquet.  No randomness —
everything is a closed-form function of the row index, seed-free, so the
committed fixtures regenerate bit-stably.

Pixel content follows the reference fixture generator's pattern
(testdata/main.go.removeme:24-56): the image is divided into 128px blocks;
block (bx,by) of band b is filled with v=(b*10+by*2+bx)*2 modulated by
pixel[i] = v*(i%4) mod 256 — so any tile of any level is checkable in closed
form.  Band count cycles {1,3,4} by img_idx%3; img_idx%5==0 rows carry an
extra all-255 mask plane appended as the last plane (mask semantics of
cog.go:227-258 with msk.Fill(255) per main.go.removeme:85).
"""

from __future__ import annotations

import pathlib
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .functions.geo import PIXEL_DEG, anchor

FIXTURE_DIR = pathlib.Path(__file__).resolve().parent.parent / "fixtures"

# dim cycles (FIXTURES.md: grid/pyramid edge cases incl. 1-px images)
TEST_DIMS = [256, 257, 300, 511, 512, 513, 129, 1]
SMOKE_DIMS = [256, 257, 300, 511, 512, 513, 1024, 1]

_WORDS = ("alpha bravo charlie delta echo foxtrot golf hotel india juliet "
          "kilo lima mike november oscar papa quebec romeo sierra tango").split()


def n_bands(i: int) -> int:
    return (1, 3, 4)[i % 3]


def has_mask(i: int) -> bool:
    # only 1- and 4-band images carry masks so the plane count (2 or 5)
    # unambiguously signals "last plane is a mask" to the decoder
    # (3-band + mask would collide with plain 4-band imagery)
    return i % 5 == 0 and n_bands(i) != 3


def image_dims(i: int, dims=TEST_DIMS):
    return dims[i % len(dims)], dims[(i + 3) % len(dims)]


def image_fmt(i: int) -> str:
    return "deflate" if i % 2 == 0 else "raw"


def make_pixels(i: int, w: int, h: int, bands: int, mask: bool) -> np.ndarray:
    """(h, w, bands[+1]) uint8, closed-form content (main.go.removeme pattern)."""
    nplanes = bands + (1 if mask else 0)
    px = np.empty((h, w, nplanes), dtype=np.uint8)
    bx = (np.arange(w) // 128)[None, :]
    by = (np.arange(h) // 128)[:, None]
    # flat index within each 128-block, row-major (reference buf index)
    ix = (np.arange(w) % 128)[None, :]
    iy = (np.arange(h) % 128)[:, None]
    mod4 = ((iy * 128 + ix) % 4).astype(np.uint8)
    for b in range(bands):
        v = ((b * 10 + by * 2 + bx) * 2).astype(np.uint8)
        px[:, :, b] = (v * mod4) & 0xFF
    if mask:
        px[:, :, bands] = 255
    return px


def encode_pixels(px: np.ndarray, fmt: str) -> bytes:
    raw = px.tobytes()
    # level 1: fixture generation is not the thing being measured
    return zlib.compress(raw, 1) if fmt == "deflate" else raw


def caption(i: int) -> str:
    words = " ".join(_WORDS[(i * 7 + k) % len(_WORDS)] for k in range(5))
    return f"caption for img_{i:08d}: {words}"


def phash(i: int) -> int:
    """Deterministic 64-bit key: ~10% duplicate a prior row, a few hot values
    repeated (dedup + skew exercises, FIXTURES.md)."""
    if i % 97 == 13:
        return 0x00DEAD00BEEF0000  # hot key
    if i % 10 == 7 and i >= 10:
        i = i - 10  # duplicate of an earlier row
    h = (i * 0x9E3779B97F4A7C15) & 0x7FFFFFFFFFFFFFFF
    return h


def write_images_parquet(path, n: int, dims=TEST_DIMS, chunk: int = 100) -> None:
    """Streaming writer for large image tables: bounded memory, small row
    groups so Spark's parquet reader gets many input splits without a
    repartition shuffle (split granularity = row group)."""
    first = make_images_table(min(chunk, n), dims)
    writer = pq.ParquetWriter(path, first.schema, compression="snappy")
    writer.write_table(first, row_group_size=8)
    done = min(chunk, n)
    while done < n:
        m = min(chunk, n - done)
        writer.write_table(_images_slice(done, m, dims), row_group_size=8)
        done += m
    writer.close()


def _images_slice(start: int, count: int, dims) -> pa.Table:
    ids, blobs, ws, hs, fmts, caps, hashes = [], [], [], [], [], [], []
    for i in range(start, start + count):
        w, h = image_dims(i, dims)
        px = make_pixels(i, w, h, n_bands(i), has_mask(i))
        ids.append(f"img_{i:08d}")
        blobs.append(encode_pixels(px, image_fmt(i)))
        ws.append(w)
        hs.append(h)
        fmts.append(image_fmt(i))
        caps.append(caption(i))
        hashes.append(phash(i))
    return pa.table({
        "image_id": pa.array(ids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
        "w": pa.array(ws, pa.int32()),
        "h": pa.array(hs, pa.int32()),
        "fmt": pa.array(fmts, pa.string()),
        "caption": pa.array(caps, pa.string()),
        "phash": pa.array(hashes, pa.int64()),
    })


def make_images_table(n: int, dims=TEST_DIMS) -> pa.Table:
    ids, blobs, ws, hs, fmts, caps, hashes = [], [], [], [], [], [], []
    for i in range(n):
        w, h = image_dims(i, dims)
        bands = n_bands(i)
        fmt = image_fmt(i)
        px = make_pixels(i, w, h, bands, has_mask(i))
        ids.append(f"img_{i:08d}")
        blobs.append(encode_pixels(px, fmt))
        ws.append(w)
        hs.append(h)
        fmts.append(fmt)
        caps.append(caption(i))
        hashes.append(phash(i))
    return pa.table({
        "image_id": pa.array(ids, pa.string()),
        "bytes": pa.array(blobs, pa.binary()),
        "w": pa.array(ws, pa.int32()),
        "h": pa.array(hs, pa.int32()),
        "fmt": pa.array(fmts, pa.string()),
        "caption": pa.array(caps, pa.string()),
        "phash": pa.array(hashes, pa.int64()),
    })


def make_points_table(n_images: int, per_image: int = 4, dims=TEST_DIMS) -> pa.Table:
    """~per_image points per image: most inside the image extent, ~10% pushed
    outside (anti-join rows), plus a hot cluster on image 0 (skew)."""
    pids, lons, lats, labels = [], [], [], []
    j = 0
    for i in range(n_images):
        w, h = image_dims(i, dims)
        lon0, lat0 = anchor(i)
        for k in range(per_image):
            fx = ((i * 31 + k * 17) % 97) / 97.0
            fy = ((i * 53 + k * 29) % 89) / 89.0
            lon = lon0 + fx * w * PIXEL_DEG
            lat = lat0 + fy * h * PIXEL_DEG
            if (i * per_image + k) % 10 == 9:
                lon += w * PIXEL_DEG + 5.0  # outside any extent
            pids.append(f"pt_{j:08d}")
            lons.append(round(lon, 9))
            lats.append(round(lat, 9))
            labels.append(f"label_{i % 7}")
            j += 1
    # hot cluster: 100 points inside image 0's first tile
    w0, h0 = image_dims(0, dims)
    lon0, lat0 = anchor(0)
    for k in range(100):
        pids.append(f"pt_{j:08d}")
        lons.append(round(lon0 + (k % 10) * 1e-5, 9))
        lats.append(round(lat0 + (k // 10) * 1e-5, 9))
        labels.append("hot")
        j += 1
    return pa.table({
        "point_id": pa.array(pids, pa.string()),
        "lon": pa.array(lons, pa.float64()),
        "lat": pa.array(lats, pa.float64()),
        "label": pa.array(labels, pa.string()),
    })


def make_zones_table(n_zones: int, n_images: int, dims=TEST_DIMS) -> pa.Table:
    """Axis-aligned rectangle zones, 1-100 tile extents, anchored over a
    deterministic spread of images; bbox columns + explicit ring for parity
    with FIXTURES.md §3."""
    zids, lon_min, lat_min, lon_max, lat_max, rings = [], [], [], [], [], []
    for z in range(n_zones):
        i = (z * 13) % n_images
        w, h = image_dims(i, dims)
        lon0, lat0 = anchor(i)
        span = (1 + (z % 10)) * 512 * PIXEL_DEG  # 1-10 tile widths
        lo_lon = lon0 - (z % 3) * 0.1
        lo_lat = lat0 - (z % 5) * 0.1
        hi_lon = lo_lon + span
        hi_lat = lo_lat + span * (1 + (z % 4)) / 2.0
        zids.append(f"zone_{z:04d}")
        lon_min.append(round(lo_lon, 9))
        lat_min.append(round(lo_lat, 9))
        lon_max.append(round(hi_lon, 9))
        lat_max.append(round(hi_lat, 9))
        rings.append([
            {"lon": lo_lon, "lat": lo_lat}, {"lon": hi_lon, "lat": lo_lat},
            {"lon": hi_lon, "lat": hi_lat}, {"lon": lo_lon, "lat": hi_lat},
        ])
    ring_type = pa.list_(pa.struct([("lon", pa.float64()), ("lat", pa.float64())]))
    return pa.table({
        "zone_id": pa.array(zids, pa.string()),
        "lon_min": pa.array(lon_min, pa.float64()),
        "lat_min": pa.array(lat_min, pa.float64()),
        "lon_max": pa.array(lon_max, pa.float64()),
        "lat_max": pa.array(lat_max, pa.float64()),
        "ring": pa.array(rings, ring_type),
    })


def write_test_fixtures(out_dir: pathlib.Path = FIXTURE_DIR, n_images: int = 240,
                        n_zones: int = 40) -> None:
    out_dir.mkdir(parents=True, exist_ok=True)
    pq.write_table(make_images_table(n_images), out_dir / "images_test.parquet",
                   compression="snappy")
    pq.write_table(make_points_table(n_images), out_dir / "points_test.parquet",
                   compression="snappy")
    pq.write_table(make_zones_table(n_zones, n_images), out_dir / "zones_test.parquet",
                   compression="snappy")


def ensure_test_fixtures() -> pathlib.Path:
    """Idempotent: (re)generate the committed fixtures if absent."""
    if not (FIXTURE_DIR / "images_test.parquet").exists():
        write_test_fixtures()
    return FIXTURE_DIR


if __name__ == "__main__":
    write_test_fixtures()
    for f in sorted(FIXTURE_DIR.glob("*.parquet")):
        print(f, f.stat().st_size)
