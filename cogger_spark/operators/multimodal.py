"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

Real Spark plumbing (schemas, Arrow batch shapes, mapInPandas signatures,
partitioning) with deterministic NumPy kernels for the formats decodable
with the stdlib; png/jpeg/mp3/h264-style codecs are STUBBED behind
NotImplementedError until a codec library exists in the environment
(FIXTURES.md: fmt values reserved).

Conventions:
* image  — bytes = (h, w, bands) u8, raw or deflate (imagecodecs.py);
* audio  — fmt 'wav': a real RIFF/PCM container decoded with the stdlib
  `wave` module (functions/audio.py — 8/16/24/32-bit, any channel count);
  fmt 'pcm16': bare mono int16 little-endian frames; metadata: sample_rate;
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


def _decode_audio(data: bytes, fmt: str, sample_rate: int | None = None):
    """(mono int16, rate) from a wav container or bare pcm16 frames."""
    from ..functions.audio import to_mono_i16, wav_decode
    if fmt in _STUB_FMTS:
        raise NotImplementedError(
            f"{fmt} decode needs a codec library absent from this environment")
    if fmt == "wav":
        samples, rate = wav_decode(data)
        return to_mono_i16(samples), rate
    if fmt == "pcm16":
        # NaN (a null rate in a float column from a mixed wav/pcm16 table)
        # must behave like None so callers hit their explicit "pcm16 rows
        # need a sample_rate" errors, not int(nan)'s ValueError (ADVICE r3)
        rate = (None if sample_rate is None or pd.isna(sample_rate)
                else int(sample_rate))
        return np.frombuffer(data, dtype="<i2"), rate
    raise ValueError(f"unknown audio fmt {fmt!r}")


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


def augment_images(images: DataFrame, out_w: int, out_h: int,
                   flip_prob: float = 0.5, seed: int = 0) -> DataFrame:
    """Deterministic training-time augmentation: per-image random crop to
    (out_w, out_h) + horizontal flip with probability `flip_prob`. The
    randomness is a per-image counter-based draw seeded from
    crc32(image_id) ^ seed — NO global RNG state, so the output is
    bit-identical across runs, partitionings, and retries (the property a
    resumable 100-TB augmentation job needs; re-running a failed partition
    must not re-roll its augmentations). The applied transform is emitted
    as metadata (crop_x, crop_y, flipped) so any sample's provenance is
    queryable. Images smaller than the crop are rejected loudly —
    silent padding would corrupt training statistics."""
    import zlib as _zlib

    schema = ("image_id string, bytes binary, w int, h int, fmt string, "
              "crop_x int, crop_y int, flipped boolean")

    def _draws(image_id: str):
        """Three uniform draws in [0,1) from a tiny counter-based hash."""
        base = _zlib.crc32(image_id.encode()) ^ (seed & 0xFFFFFFFF)
        out = []
        for i in range(3):
            # xorshift-style mix of (base, i) — cheap, stateless, stable
            x = (base + 0x9E3779B9 * (i + 1)) & 0xFFFFFFFF
            x ^= x >> 16
            x = (x * 0x45D9F3B) & 0xFFFFFFFF
            x ^= x >> 16
            out.append(x / 2 ** 32)
        return out

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("image_id", "bytes", "w", "h", "fmt",
                                   "crop_x", "crop_y", "flipped")}
            for r in pdf.itertuples(index=False):
                w, h = int(r.w), int(r.h)
                if w < out_w or h < out_h:
                    raise ValueError(
                        f"{r.image_id}: {w}x{h} smaller than crop "
                        f"{out_w}x{out_h}")
                px = _decode(r.bytes, w, h, r.fmt)
                u_x, u_y, u_f = _draws(r.image_id)
                cx = int(u_x * (w - out_w + 1))
                cy = int(u_y * (h - out_h + 1))
                flip = u_f < flip_prob
                crop = px[cy:cy + out_h, cx:cx + out_w]
                if flip:
                    crop = crop[:, ::-1]
                out["image_id"].append(r.image_id)
                out["bytes"].append(np.ascontiguousarray(crop).tobytes())
                out["w"].append(out_w)
                out["h"].append(out_h)
                out["fmt"].append("raw")
                out["crop_x"].append(cx)
                out["crop_y"].append(cy)
                out["flipped"].append(bool(flip))
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
    """Windowed RMS over the decoded mono PCM — wav containers (stdlib
    decode) and bare pcm16 rows share the kernel."""
    schema = "audio_id string, n_windows int, rms array<double>"
    has_rate = "sample_rate" in audio.columns

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"audio_id": [], "n_windows": [], "rms": []}
            for r in pdf.itertuples(index=False):
                pcm, _rate = _decode_audio(
                    r.bytes, r.fmt, getattr(r, "sample_rate", None))
                pcm = pcm.astype(np.float64)
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

    cols = ["audio_id", "bytes", "fmt"] + (["sample_rate"] if has_rate else [])
    return audio.select(*cols).mapInPandas(kernel, schema=schema)


def audio_stats(audio: DataFrame) -> DataFrame:
    """Per-clip decode → duration / rate / channel metadata + RMS and peak
    over the mono mix — the audio analogue of dataset_stats, end-to-end
    through the real wav container."""
    schema = ("audio_id string, sample_rate int, n_frames long, "
              "n_channels int, duration_s double, rms double, peak int")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.audio import to_mono_i16, wav_decode
        for pdf in batches:
            out = {k: [] for k in ("audio_id", "sample_rate", "n_frames",
                                   "n_channels", "duration_s", "rms", "peak")}
            for r in pdf.itertuples(index=False):
                if r.fmt in _STUB_FMTS:
                    raise NotImplementedError(
                        f"{r.fmt} decode needs a codec library")
                if r.fmt == "wav":
                    samples, rate = wav_decode(r.bytes)
                else:
                    pcm, rate = _decode_audio(
                        r.bytes, r.fmt, getattr(r, "sample_rate", None))
                    if rate is None:
                        raise ValueError(
                            "pcm16 rows need a sample_rate column for stats")
                    samples = pcm[:, None]
                mono = to_mono_i16(samples).astype(np.float64)
                out["audio_id"].append(r.audio_id)
                out["sample_rate"].append(rate)
                out["n_frames"].append(samples.shape[0])
                out["n_channels"].append(samples.shape[1])
                out["duration_s"].append(samples.shape[0] / rate)
                out["rms"].append(float(np.sqrt((mono * mono).mean()))
                                  if samples.shape[0] else 0.0)
                out["peak"].append(int(np.abs(mono).max())
                                   if samples.shape[0] else 0)
            yield pd.DataFrame(out)

    cols = [c for c in ("audio_id", "bytes", "fmt", "sample_rate")
            if c in audio.columns]
    return audio.select(*cols).mapInPandas(kernel, schema=schema)


def audio_resample(audio: DataFrame, out_rate: int) -> DataFrame:
    """Decode → mono downmix → linear-interp resample to `out_rate`; output
    stays an opaque pcm16 binary column with updated metadata (the resize
    analogue for the audio modality)."""
    schema = ("audio_id string, bytes binary, fmt string, sample_rate int, "
              "n_frames long")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from ..functions.audio import resample_linear_i16
        for pdf in batches:
            out = {k: [] for k in ("audio_id", "bytes", "fmt", "sample_rate",
                                   "n_frames")}
            for r in pdf.itertuples(index=False):
                mono, rate = _decode_audio(
                    r.bytes, r.fmt, getattr(r, "sample_rate", None))
                if rate is None:
                    raise ValueError(
                        "pcm16 rows need a sample_rate column to resample")
                rs = resample_linear_i16(mono, rate, out_rate)
                out["audio_id"].append(r.audio_id)
                out["bytes"].append(rs.astype("<i2").tobytes())
                out["fmt"].append("pcm16")
                out["sample_rate"].append(out_rate)
                out["n_frames"].append(len(rs))
            yield pd.DataFrame(out)

    cols = [c for c in ("audio_id", "bytes", "fmt", "sample_rate")
            if c in audio.columns]
    return audio.select(*cols).mapInPandas(kernel, schema=schema)


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
