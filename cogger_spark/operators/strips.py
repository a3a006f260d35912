"""Distributed strip pipeline — the oversized-image scale path.

The direct path (tiling.py) holds one whole image per kernel call; fine for
images up to ~10^8 px, not for multi-gigapixel rasters. This pipeline is the
Spark re-expression of the reference's parallel decomposition
(cmd/pcogger/parallel-cogger.go, stripper.go): the image becomes full-width
strip rows early, and every later stage — overview construction, tile
cutting, assembly — is bounded by strip size, not image size.

    level-0 strips  (mapInPandas: decode once, slice by the planner)
      → level k strips from level k-1 strips (groupBy child strip:
        parents shuffled to the child, exact 2x downsample) — the DAG of
        stripper.go:223-259 as an equi-join on (image_id, level, child_id)
      → strips → tiles (narrow; strip tops are tile-aligned by the planner,
        stripper.go:309-313)
      → assemble_cogs (identical to the direct path)

Downsampling uses the exact integer mapping child row r ← parent rows
{2r, 2r+1 clipped}, so the strip path produces byte-identical tiles to the
direct path (asserted in tests) — the distributed equivalent of the
reference's requirement that strip boundaries not change pixel results.
"""

from __future__ import annotations

import zlib
from typing import Iterator, List, Tuple

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.imagecodecs import cut_tiles, downsample2x, encode_image
from ..planner import Stripper
from .tiling import TILE_SCHEMA

STRIP_SCHEMA = (
    "image_id string, level int, strip_id int, top_row int, strip_h int, "
    "level_w int, level_h int, n_levels int, planes int, has_mask boolean, "
    "payload binary"
)


def _plan(w: int, h: int, tile: int, target_px: int) -> List[List[Tuple[int, int]]]:
    """Per level: [(top_row, height)] strip bounds (planner semantics)."""
    s = Stripper(w, h, tile_width=tile, tile_height=tile,
                 target_pixel_count=target_px)
    out = []
    for img in s.pyramid():
        bounds, top = [], 0
        for st in img.strips:
            bounds.append((top, st.height))
            top += st.height
        out.append(bounds)
    return out


def strips_level0(images: DataFrame, tile: int = 512,
                  target_px: int = 1024 * 1024) -> DataFrame:
    """Decode each image once and emit its full-res strips as rows."""

    from .tiling import ensure_fanout
    images = ensure_fanout(images)

    FLUSH_BYTES = 32 * 1024 * 1024  # output-accumulation bound per yield

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ("image_id", "level", "strip_id", "top_row", "strip_h",
                "level_w", "level_h", "n_levels", "planes", "has_mask",
                "payload")
        out = {k: [] for k in cols}
        acc = 0
        for pdf in batches:
            for r in pdf.itertuples(index=False):
                w, h = int(r.w), int(r.h)
                from .tiling import decode_any
                px, nplanes, mask = decode_any(r.bytes, w, h, r.fmt)
                plan = _plan(w, h, tile, target_px)
                for sid, (top, sh) in enumerate(plan[0]):
                    payload = zlib.compress(px[top:top + sh].tobytes(), 1)
                    out["image_id"].append(r.image_id)
                    out["level"].append(0)
                    out["strip_id"].append(sid)
                    out["top_row"].append(top)
                    out["strip_h"].append(sh)
                    out["level_w"].append(w)
                    out["level_h"].append(h)
                    out["n_levels"].append(len(plan))
                    out["planes"].append(nplanes)
                    out["has_mask"].append(mask)
                    out["payload"].append(payload)
                    acc += len(payload)
                    # flush per strip: an oversized image must never require
                    # its own full output in worker memory
                    if acc >= FLUSH_BYTES:
                        yield pd.DataFrame(out)
                        out = {k: [] for k in cols}
                        acc = 0
        if out["image_id"]:
            yield pd.DataFrame(out)

    return images.select("image_id", "bytes", "w", "h", "fmt") \
                 .mapInPandas(kernel, schema=STRIP_SCHEMA)


def next_level_strips(strips: DataFrame, level: int, tile: int = 512,
                      target_px: int = 1024 * 1024) -> DataFrame:
    """Level `level` strips from level-1 strips.

    1. narrow pass routes each parent strip to the child strips whose source
       window [2*c_top, 2*(c_top+c_h)) it overlaps (the DAG edges);
    2. groupBy (image_id, child strip) + applyInPandas stacks the parents,
       slices the exact source rows, and 2x-average downsamples.
    """
    parents = strips.filter(F.col("level") == level - 1)

    route_schema = STRIP_SCHEMA + ", child_id int, child_top int, child_h int"

    def route(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                # recompute the per-image plan from the original dims carried
                # on level-0 rows (level_w/level_h of the *parent* level)
                pw, ph = int(r.level_w), int(r.level_h)
                cw, ch_ = -(-pw // 2), -(-ph // 2)
                plan = _plan_for_dims(cw, ch_, tile, target_px)
                p_top, p_h = int(r.top_row), int(r.strip_h)
                for cid, (c_top, c_h) in enumerate(plan):
                    src0, src1 = 2 * c_top, min(2 * (c_top + c_h), ph)
                    if src0 < p_top + p_h and src1 > p_top:
                        d = r._asdict()
                        d.update(child_id=cid, child_top=c_top, child_h=c_h)
                        rows.append(d)
            yield pd.DataFrame(rows) if rows else pd.DataFrame(
                {c: [] for c in list(pdf.columns) + ["child_id", "child_top", "child_h"]})

    routed = parents.mapInPandas(route, schema=route_schema)

    def combine(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("top_row")
        r0 = pdf.iloc[0]
        pw, ph = int(r0.level_w), int(r0.level_h)
        cw, ch_ = -(-pw // 2), -(-ph // 2)
        nplanes_total = int(r0.planes) + (1 if bool(r0.has_mask) else 0)
        slabs = [np.frombuffer(zlib.decompress(p), dtype=np.uint8)
                 .reshape(int(sh), pw, nplanes_total)
                 for p, sh in zip(pdf["payload"], pdf["strip_h"])]
        stack = np.concatenate(slabs, axis=0)
        base = int(pdf["top_row"].iloc[0])
        c_top, c_h = int(r0.child_top), int(r0.child_h)
        src0, src1 = 2 * c_top, min(2 * (c_top + c_h), ph)
        window = stack[src0 - base: src1 - base]
        down = downsample2x(window)
        return pd.DataFrame({
            "image_id": [r0.image_id], "level": [level],
            "strip_id": [int(r0.child_id)], "top_row": [c_top],
            "strip_h": [c_h], "level_w": [cw], "level_h": [ch_],
            "n_levels": [int(r0.n_levels)], "planes": [int(r0.planes)],
            "has_mask": [bool(r0.has_mask)],
            "payload": [zlib.compress(down.tobytes(), 1)],
        })

    return (routed.groupBy("image_id", "child_id")
            .applyInPandas(combine, schema=STRIP_SCHEMA))


def _plan_for_dims(w: int, h: int, tile: int, target_px: int):
    """Strip bounds for one level of the given dims (planner stripping rule)."""
    s = Stripper(w, h, tile_width=tile, tile_height=tile,
                 target_pixel_count=target_px, overview_count=0)
    bounds, top = [], 0
    for st in s.pyramid()[0].strips:
        bounds.append((top, st.height))
        top += st.height
    return bounds


def strips_to_tiles(strips: DataFrame, tile: int = 512,
                    compression: str = "deflate") -> DataFrame:
    """Cut every strip into tiles; strip tops are tile-aligned (planner) so
    global ty = top_row//tile + local ty. Narrow stage, no shuffle."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("image_id", "level", "plane", "ty", "tx",
                                   "level_w", "level_h", "n_levels", "planes",
                                   "has_mask", "byte_count", "payload")}
            for r in pdf.itertuples(index=False):
                nplanes = int(r.planes)
                mask = bool(r.has_mask)
                total = nplanes + (1 if mask else 0)
                px = np.frombuffer(zlib.decompress(r.payload), dtype=np.uint8) \
                    .reshape(int(r.strip_h), int(r.level_w), total)
                ty0 = int(r.top_row) // tile
                for tx, lty, block in cut_tiles(px, tile):
                    for plane, sl in (((0, slice(0, nplanes)),)
                                      + (((1, slice(nplanes, total)),) if mask else ())):
                        payload = encode_image(block[:, :, sl], compression)
                        out["image_id"].append(r.image_id)
                        out["level"].append(int(r.level))
                        out["plane"].append(plane)
                        out["ty"].append(ty0 + lty)
                        out["tx"].append(tx)
                        out["level_w"].append(int(r.level_w))
                        out["level_h"].append(int(r.level_h))
                        out["n_levels"].append(int(r.n_levels))
                        out["planes"].append(nplanes)
                        out["has_mask"].append(mask)
                        out["byte_count"].append(len(payload))
                        out["payload"].append(payload)
            yield pd.DataFrame(out)

    return strips.mapInPandas(kernel, schema=TILE_SCHEMA)


def tile_images_strips(images: DataFrame, tile: int = 512,
                       compression: str = "deflate",
                       target_px: int = 1024 * 1024,
                       max_levels: int = 16,
                       max_dims: tuple[int, int] | None = None) -> DataFrame:
    """images → tiles via the strip pipeline. Level k is an iterative
    DataFrame pass over level k-1 (the VRT barrier of pcogger:60-77 becomes a
    shuffle). n_levels is data-dependent, so the loop depth comes from a
    cheap driver-side max(w), max(h) scan (parquet footer stats): the deepest
    possible pyramid is the halvings-until-one-tile closed form on the
    largest dims — per-image n_levels can only be smaller (the min with the
    min-size rule), and each frame filters `level < n_levels`. This avoids
    unioning max_levels-1 mostly-empty shuffle stages for shallow inputs;
    max_levels stays as a hard cap."""
    import math
    if max_dims is None:  # caller may pass probed dims to skip this job
        row = images.agg(F.max("w").alias("w"), F.max("h").alias("h")).first()
        max_dims = (row["w"], row["h"])
    if max_dims[0] is None:  # empty input: one (empty) level-0 frame suffices
        depth = 1
    else:
        k_tile = max(0,
                     math.ceil(math.log2(max(int(max_dims[0]), 1) / tile)),
                     math.ceil(math.log2(max(int(max_dims[1]), 1) / tile)))
        depth = min(max_levels, k_tile + 1)
    # Two structural rules keep the gigapixel path at full width and at
    # exactly-once compute (event-log verified — without them the decode
    # scan ran once PER PYRAMID BRANCH and the kernel stage had a 4x skew
    # straggler):
    #
    # 1. FAN OUT level-0 strips from their decode partitions. The decode is
    #    one task per scan split (one per IMAGE — a sequential blob can't be
    #    split), and without the repartition every downstream narrow stage —
    #    level-0 tile cutting + encode, the dominant kernel, and the level-1
    #    route's payload decompress — stays at image-level parallelism,
    #    serializing a 0.5-gigapixel image behind one core. 4x parallelism
    #    partitions keep the expected strips-per-task near 1 so the hash-
    #    placement Poisson tail can't create a multi-strip straggler.
    # 2. CHECKPOINT each level once. Every level feeds TWO consumers (its
    #    tiles-union branch and the next level's route); Catalyst's exchange
    #    reuse does not survive the branches' differing column pruning, so
    #    without a materialization boundary each level — including the
    #    whole-image decode — computes once per branch. The stored bytes are
    #    the zlib-packed strips (≈ input-sized), the standard price of a
    #    multi-consumer pyramid; blocks are ContextCleaner-released when the
    #    frames are garbage collected.
    slots = images.sparkSession.sparkContext.defaultParallelism
    level0 = (strips_level0(images, tile=tile, target_px=target_px)
              .repartition(4 * slots, "image_id", "strip_id")
              .localCheckpoint(eager=True))
    frames = [level0]
    current = level0
    for lvl in range(1, depth):
        nxt = next_level_strips(current, lvl, tile=tile, target_px=target_px)
        nxt = (nxt.filter(F.col("level") < F.col("n_levels"))
               .localCheckpoint(eager=True))
        frames.append(nxt)
        current = nxt
    all_strips = frames[0]
    for f in frames[1:]:
        all_strips = all_strips.unionByName(f)
    return strips_to_tiles(all_strips, tile=tile, compression=compression)
