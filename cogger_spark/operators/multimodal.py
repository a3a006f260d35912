"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Real Spark plumbing (schemas, Arrow batch shapes, mapInPandas signatures,
partitioning) with deterministic NumPy kernels for the formats decodable
with the stdlib; png/jpeg/mp3/h264-style codecs are STUBBED behind
NotImplementedError until a codec library exists in the environment
(FIXTURES.md: fmt values reserved).

Conventions:
* image  — bytes = (h, w, bands) u8, raw or deflate (imagecodecs.py);
* audio  — bytes = mono int16 PCM little-endian; metadata: sample_rate;
* video  — bytes = n_frames × (h, w, bands) u8 concatenated (a deterministic
  fake layout standing in for a real container until codecs exist).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.imagecodecs import decode_image

_STUB_FMTS = {"webp", "mp3", "aac", "h264", "av1"}


def _decode(data: bytes, w: int, h: int, fmt: str) -> np.ndarray:
    import zlib
    if fmt in _STUB_FMTS:
        raise NotImplementedError(
            f"{fmt} requires a codec library absent from this environment")
    if fmt == "png":  # real pure-Python codec (functions/png.py)
        from ..functions.png import png_decode
        return png_decode(data)
    if fmt == "jpeg":  # real pure-Python baseline decoder (functions/jpeg.py)
        from ..functions.jpeg import jpeg_decode
        return jpeg_decode(data)
    buf = zlib.decompress(data) if fmt == "deflate" else data
    k = len(buf) // (w * h)
    return decode_image(buf, w, h, "raw", k)


def image_features(images: DataFrame) -> DataFrame:
    """Per-band mean/std feature vector — the feature-extraction plumbing
    (schema: array<double>), vectorized over Arrow batches."""
    schema = "image_id string, n_bands int, features array<double>"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nbs, feats = [], [], []
            for r in pdf.itertuples(index=False):
                px = _decode(r.bytes, int(r.w), int(r.h), r.fmt)
                b = px.shape[2]
                f = np.concatenate([px.mean(axis=(0, 1)), px.std(axis=(0, 1))])
                ids.append(r.image_id)
                nbs.append(b)
                feats.append([float(x) for x in f])
            yield pd.DataFrame({"image_id": ids, "n_bands": nbs, "features": feats})

    return images.select("image_id", "bytes", "w", "h", "fmt") \
                 .mapInPandas(kernel, schema=schema)


def resize_images(images: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize (deterministic, codec-free); output stays an
    opaque binary column with updated metadata."""
    schema = "image_id string, bytes binary, w int, h int, fmt string"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"image_id": [], "bytes": [], "w": [], "h": [], "fmt": []}
            for r in pdf.itertuples(index=False):
                px = _decode(r.bytes, int(r.w), int(r.h), r.fmt)
                yi = (np.arange(out_h) * r.h // out_h).astype(np.int64)
                xi = (np.arange(out_w) * r.w // out_w).astype(np.int64)
                rs = px[yi][:, xi]
                out["image_id"].append(r.image_id)
                out["bytes"].append(rs.tobytes())
                out["w"].append(out_w)
                out["h"].append(out_h)
                out["fmt"].append("raw")
            yield pd.DataFrame(out)

    return images.select("image_id", "bytes", "w", "h", "fmt") \
                 .mapInPandas(kernel, schema=schema)


def sample_frames(videos: DataFrame, every_k: int = 2) -> DataFrame:
    """Video frame sampling over the deterministic fake layout: explode every
    k-th frame into an image row (real partitioning/batching; the container
    demux is what a codec library would replace)."""
    schema = "video_id string, frame_idx int, bytes binary, w int, h int"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"video_id": [], "frame_idx": [], "bytes": [], "w": [], "h": []}
            for r in pdf.itertuples(index=False):
                if r.fmt in _STUB_FMTS:
                    raise NotImplementedError(f"{r.fmt} demux needs a codec library")
                frame = int(r.w) * int(r.h) * int(r.bands)
                n = len(r.bytes) // frame
                for i in range(0, n, every_k):
                    out["video_id"].append(r.video_id)
                    out["frame_idx"].append(i)
                    out["bytes"].append(r.bytes[i * frame:(i + 1) * frame])
                    out["w"].append(int(r.w))
                    out["h"].append(int(r.h))
            yield pd.DataFrame(out)

    return videos.select("video_id", "bytes", "w", "h", "bands", "fmt") \
                 .mapInPandas(kernel, schema=schema)


def audio_features(audio: DataFrame, window: int = 1024) -> DataFrame:
    """Windowed RMS over int16 PCM — audio feature plumbing."""
    schema = "audio_id string, n_windows int, rms array<double>"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"audio_id": [], "n_windows": [], "rms": []}
            for r in pdf.itertuples(index=False):
                if r.fmt in _STUB_FMTS:
                    raise NotImplementedError(f"{r.fmt} decode needs a codec library")
                pcm = np.frombuffer(r.bytes, dtype="<i2").astype(np.float64)
                n = len(pcm) // window
                if n == 0:
                    out["audio_id"].append(r.audio_id)
                    out["n_windows"].append(0)
                    out["rms"].append([])
                    continue
                w = pcm[: n * window].reshape(n, window)
                rms = np.sqrt((w * w).mean(axis=1))
                out["audio_id"].append(r.audio_id)
                out["n_windows"].append(n)
                out["rms"].append([float(x) for x in rms])
            yield pd.DataFrame(out)

    return audio.select("audio_id", "bytes", "fmt") \
                .mapInPandas(kernel, schema=schema)


def compute_phash(images: DataFrame) -> DataFrame:
    """Recompute the perceptual hash from pixels (average-hash kernel,
    functions/phash.py) — the engine-side alternative to trusting the input
    phash column. Identical pixel content yields identical hashes, so the
    output keys the same dedup paths (phash_canonical / dedup_images)."""
    from ..functions.phash import average_hash

    schema = "image_id string, computed_phash long"

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for r in pdf.itertuples(index=False):
                px = _decode(r.bytes, int(r.w), int(r.h), r.fmt)
                ids.append(r.image_id)
                hashes.append(average_hash(px))
            yield pd.DataFrame({"image_id": ids, "computed_phash": hashes})

    return images.select("image_id", "bytes", "w", "h", "fmt") \
                 .mapInPandas(kernel, schema=schema)


def band_index_stats(images: DataFrame, band_a: int = 0, band_b: int = 1) -> DataFrame:
    """Raster algebra: per-image normalized-difference index
    (a-b)/(a+b) between two bands (the NDVI shape), reduced to per-image
    statistics — mean/min/max over valid pixels (denominator > 0). Pixel math
    runs vectorized in the Arrow kernel; images lacking band_b are skipped."""
    schema = ("image_id string, n_valid long, nd_mean double, "
              "nd_min double, nd_max double")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"image_id": [], "n_valid": [], "nd_mean": [],
                   "nd_min": [], "nd_max": []}
            for r in pdf.itertuples(index=False):
                from .tiling import infer_planes
                px = _decode(r.bytes, int(r.w), int(r.h), r.fmt)
                nbands, _has_mask = infer_planes(px.size, int(r.w), int(r.h))
                if nbands <= max(band_a, band_b):
                    continue  # not enough imagery bands (mask excluded)
                a = px[:, :, band_a].astype(np.float64)
                b = px[:, :, band_b].astype(np.float64)
                denom = a + b
                valid = denom > 0
                nd = np.zeros_like(a)
                nd[valid] = (a[valid] - b[valid]) / denom[valid]
                vals = nd[valid]
                out["image_id"].append(r.image_id)
                out["n_valid"].append(int(valid.sum()))
                out["nd_mean"].append(float(vals.mean()) if vals.size else 0.0)
                out["nd_min"].append(float(vals.min()) if vals.size else 0.0)
                out["nd_max"].append(float(vals.max()) if vals.size else 0.0)
            yield pd.DataFrame(out)

    return images.select("image_id", "bytes", "w", "h", "fmt") \
                 .mapInPandas(kernel, schema=schema)
