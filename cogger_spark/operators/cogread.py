"""COG consumption operators — the reader side of the engine's outputs.

The COG layout exists so consumers can fetch a header in one read and then
range-read exactly the tiles they need (LAYOUT=IFDS_BEFORE_DATA,
cog.go:505-520). These operators exercise that property over DataFrames of
COG blobs:

* extract_thumbnails — decode only the deepest (smallest) overview;
* fetch_tiles — point lookups (image_id, level, ty, tx) → tile payloads by
  header-offset slicing, never scanning tile data;
* header-only audit (read_cog_headers) — parse the metadata of every blob
  without touching payload bytes beyond the header span.
"""

from __future__ import annotations

import zlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..tiff.codec import assemble_ifd_tree, parse_tiff


def read_cog_headers(cogs: DataFrame) -> DataFrame:
    """Parse each blob's header: level count, grid dims, data start — the
    single-seek metadata fetch a cloud reader would issue."""
    schema = ("image_id string, n_levels int, has_mask boolean, w int, h int, "
              "tile int, data_start long, header_frac double")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("image_id", "n_levels", "has_mask", "w", "h",
                                   "tile", "data_start", "header_frac")}
            for r in pdf.itertuples(index=False):
                blob = bytes(r.cog)
                main = assemble_ifd_tree(parse_tiff(blob).ifds)
                positive = [o for f in [main] + main.overviews
                            + ([main.mask] if main.mask else [])
                            for o in f.tile_offsets if o > 0]
                start = min(positive) if positive else len(blob)
                out["image_id"].append(r.image_id)
                out["n_levels"].append(1 + len(main.overviews))
                out["has_mask"].append(main.mask is not None)
                out["w"].append(main.image_width)
                out["h"].append(main.image_height)
                out["tile"].append(main.tile_width)
                out["data_start"].append(start)
                out["header_frac"].append(round(start / len(blob), 6))
            yield pd.DataFrame(out)

    return cogs.select("image_id", "cog").mapInPandas(kernel, schema)


def extract_thumbnails(cogs: DataFrame) -> DataFrame:
    """Decode ONLY the deepest overview of each COG into a raw thumbnail —
    the pyramid exists precisely so this never touches full-res bytes."""
    schema = "image_id string, thumb binary, tw int, th int, bands int"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.imagecodecs import decode_image, stitch_tiles
        for pdf in batches:
            out = {k: [] for k in ("image_id", "thumb", "tw", "th", "bands")}
            for r in pdf.itertuples(index=False):
                main = assemble_ifd_tree(parse_tiff(bytes(r.cog)).ifds)
                ifd = main.overviews[-1] if main.overviews else main
                bands = ifd.samples_per_pixel
                tiles = {}
                for ty in range(ifd.n_tiles_y()):
                    for tx in range(ifd.n_tiles_x()):
                        blob = ifd.load_tile(ifd.tile_idx(tx, ty, 0))
                        raw = zlib.decompress(blob) if ifd.compression == 8 else blob
                        tiles[(tx, ty)] = decode_image(
                            raw, ifd.tile_width, ifd.tile_height, "raw", bands)
                px = stitch_tiles(tiles, ifd.image_width, ifd.image_height,
                                  bands, ifd.tile_width)
                out["image_id"].append(r.image_id)
                out["thumb"].append(px.tobytes())
                out["tw"].append(ifd.image_width)
                out["th"].append(ifd.image_height)
                out["bands"].append(bands)
            yield pd.DataFrame(out)

    return cogs.select("image_id", "cog").mapInPandas(kernel, schema)


def fetch_tiles(cogs: DataFrame, requests: DataFrame) -> DataFrame:
    """Tile-server point lookups: join tile requests (image_id, level, ty,
    tx) to their COG blob and slice each payload at the header's offset —
    the Spark analogue of issuing one range read per requested tile."""
    schema = ("image_id string, level int, ty int, tx int, byte_count long, "
              "payload binary")

    joined = requests.join(cogs.select("image_id", "cog"), "image_id")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("image_id", "level", "ty", "tx",
                                   "byte_count", "payload")}
            trees = {}
            for r in pdf.itertuples(index=False):
                if r.image_id not in trees:
                    trees[r.image_id] = assemble_ifd_tree(
                        parse_tiff(bytes(r.cog)).ifds)
                main = trees[r.image_id]
                ifd = main if r.level == 0 else main.overviews[r.level - 1]
                idx = ifd.tile_idx(int(r.tx), int(r.ty), 0)
                payload = ifd.load_tile(idx)
                out["image_id"].append(r.image_id)
                out["level"].append(int(r.level))
                out["ty"].append(int(r.ty))
                out["tx"].append(int(r.tx))
                out["byte_count"].append(len(payload))
                out["payload"].append(payload)
            yield pd.DataFrame(out)

    return joined.mapInPandas(kernel, schema)
