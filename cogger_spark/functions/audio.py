"""WAV (RIFF PCM) decode/encode via the stdlib `wave` module — the one
audio container honestly decodable in this environment (no codec libraries;
mp3/aac stay declared stubs in operators/multimodal.py).

Decode contract: wav_decode(bytes) -> (samples, sample_rate) where samples
is an int16 ndarray of shape (n_frames, n_channels); 8/16/24/32-bit PCM
inputs are normalized to int16 (shift toward the 16-bit grid, the usual
convention), so every downstream kernel sees one dtype.
"""

from __future__ import annotations

import io
import wave

import numpy as np


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM → (int16 (n_frames, n_channels), sample_rate)."""
    with wave.open(io.BytesIO(data), "rb") as w:
        nch = w.getnchannels()
        width = w.getsampwidth()
        rate = w.getframerate()
        raw = w.readframes(w.getnframes())
    if width == 2:
        s = np.frombuffer(raw, dtype="<i2").astype(np.int16)
    elif width == 1:  # unsigned 8-bit, offset-binary per the WAV spec
        s = ((np.frombuffer(raw, dtype=np.uint8).astype(np.int16) - 128) << 8)
    elif width == 3:  # packed little-endian 24-bit
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        v = (b[:, 0].astype(np.int32)
             | (b[:, 1].astype(np.int32) << 8)
             | (b[:, 2].astype(np.int32) << 16))
        v = np.where(v >= 1 << 23, v - (1 << 24), v)
        s = (v >> 8).astype(np.int16)
    elif width == 4:
        s = (np.frombuffer(raw, dtype="<i4") >> 16).astype(np.int16)
    else:
        raise ValueError(f"wav: unsupported sample width {width}")
    return s.reshape(-1, nch), rate


def wav_encode(samples: np.ndarray, rate: int) -> bytes:
    """(n_frames, n_channels) int16 → RIFF/WAVE PCM bytes (test fixture
    generator and the round-trip oracle for wav_decode)."""
    samples = np.asarray(samples, dtype="<i2")
    if samples.ndim == 1:
        samples = samples[:, None]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(samples.shape[1])
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def to_mono_i16(samples: np.ndarray) -> np.ndarray:
    """Channel-average downmix, rounded half away from zero in float64 —
    deterministic and oracle-reproducible."""
    if samples.shape[1] == 1:
        return samples[:, 0].astype(np.int16)
    m = samples.astype(np.float64).mean(axis=1)
    return np.trunc(m + np.copysign(0.5, m)).astype(np.int16)


def resample_linear_i16(mono: np.ndarray, in_rate: int,
                        out_rate: int) -> np.ndarray:
    """Linear-interpolation resample of mono int16 PCM: output frame k
    samples input position k * in_rate / out_rate (exact rational positions,
    float64 interp, round-half-away) — the deterministic baseline kernel."""
    if in_rate == out_rate or len(mono) == 0:
        return mono.astype(np.int16)
    n_out = int(len(mono) * out_rate // in_rate)
    pos = np.arange(n_out, dtype=np.float64) * in_rate / out_rate
    i0 = np.minimum(pos.astype(np.int64), len(mono) - 1)
    i1 = np.minimum(i0 + 1, len(mono) - 1)
    frac = pos - i0
    v = mono[i0].astype(np.float64) * (1 - frac) + mono[i1].astype(np.float64) * frac
    return np.trunc(v + np.copysign(0.5, v)).astype(np.int16)
