"""WAV audio through the real stdlib container (VERDICT r2 item 5): decode /
stats / windowed RMS / resample flow end-to-end through the mapInPandas
plumbing, checked against direct NumPy oracles; mp3/aac stay declared
stubs."""

import numpy as np
import pytest

from cogger_spark.functions.audio import (
    resample_linear_i16,
    to_mono_i16,
    wav_decode,
    wav_encode,
)

RATE = 8000


def _sine(n, freq, amp=9000, rate=RATE, phase=0.0):
    t = np.arange(n, dtype=np.float64) / rate
    return np.round(amp * np.sin(2 * np.pi * freq * t + phase)).astype(np.int16)


def test_wav_roundtrip_and_widths():
    mono = _sine(4096, 440)
    dec, rate = wav_decode(wav_encode(mono, RATE))
    assert rate == RATE and dec.shape == (4096, 1)
    assert np.array_equal(dec[:, 0], mono)
    # stereo round-trips per channel
    st = np.stack([_sine(1000, 440), _sine(1000, 880)], axis=1)
    dec2, _ = wav_decode(wav_encode(st, RATE))
    assert np.array_equal(dec2, st)
    # 8-bit: offset-binary scaled to the int16 grid
    import io
    import wave
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(RATE)
        w.writeframes(bytes([0, 128, 255, 200]))
    dec8, _ = wav_decode(buf.getvalue())
    assert dec8[:, 0].tolist() == [-128 << 8, 0, 127 << 8, 72 << 8]


@pytest.fixture(scope="module")
def audio_df(spark):
    rows = []
    clips = {}
    for i, (freq, nch) in enumerate([(440, 1), (880, 2), (220, 1)]):
        n = 4096 + 111 * i
        if nch == 1:
            s = _sine(n, freq)[:, None]
        else:
            s = np.stack([_sine(n, freq), _sine(n, freq * 1.5)], axis=1)
        clips[f"a{i}"] = s
        rows.append((f"a{i}", wav_encode(s, RATE), "wav"))
    df = spark.createDataFrame(rows, "audio_id string, bytes binary, fmt string")
    return df, clips


def test_audio_stats_matches_numpy(spark, audio_df):
    from cogger_spark.operators.multimodal import audio_stats
    df, clips = audio_df
    got = {r.audio_id: r for r in audio_stats(df).collect()}
    assert set(got) == set(clips)
    for aid, s in clips.items():
        mono = to_mono_i16(s).astype(np.float64)
        r = got[aid]
        assert r.sample_rate == RATE
        assert r.n_frames == s.shape[0] and r.n_channels == s.shape[1]
        assert abs(r.duration_s - s.shape[0] / RATE) < 1e-12
        assert abs(r.rms - float(np.sqrt((mono * mono).mean()))) < 1e-9
        assert r.peak == int(np.abs(mono).max())


def test_audio_features_wav_matches_numpy(spark, audio_df):
    from cogger_spark.operators.multimodal import audio_features
    df, clips = audio_df
    got = {r.audio_id: r for r in audio_features(df, window=512).collect()}
    for aid, s in clips.items():
        mono = to_mono_i16(s).astype(np.float64)
        n = len(mono) // 512
        want = np.sqrt((mono[:n * 512].reshape(n, 512) ** 2).mean(axis=1))
        assert got[aid].n_windows == n
        assert np.allclose(got[aid].rms, want, atol=1e-9)


def test_audio_resample_matches_numpy(spark, audio_df):
    from cogger_spark.operators.multimodal import audio_resample
    df, clips = audio_df
    out = {r.audio_id: r for r in audio_resample(df, out_rate=5000).collect()}
    for aid, s in clips.items():
        r = out[aid]
        assert r.fmt == "pcm16" and r.sample_rate == 5000
        got = np.frombuffer(bytes(r.bytes), dtype="<i2")
        want = resample_linear_i16(to_mono_i16(s), RATE, 5000)
        assert r.n_frames == len(want)
        assert np.array_equal(got, want)
    # resampled rows flow back through the pipeline (pcm16 + rate column)
    from cogger_spark.operators.multimodal import audio_stats
    rs = audio_resample(df, out_rate=5000)
    st = {r.audio_id: r for r in audio_stats(rs).collect()}
    assert all(st[a].sample_rate == 5000 for a in clips)


def test_audio_stub_fmts_still_raise(spark):
    from cogger_spark.operators.multimodal import audio_stats
    df = spark.createDataFrame([("x", b"\x00\x01", "mp3")],
                               "audio_id string, bytes binary, fmt string")
    with pytest.raises(Exception, match="codec library"):
        audio_stats(df).collect()


def test_pcm16_nan_sample_rate_hits_explicit_error(spark):
    """A mixed wav/pcm16 table read back from parquet carries sample_rate as
    a float column, so a missing rate arrives as NaN — it must behave like
    None and surface the explicit 'pcm16 rows need a sample_rate' error,
    never int(nan)'s bare ValueError (ADVICE r3)."""
    import pytest as _pytest
    from cogger_spark.operators.multimodal import audio_stats
    df = spark.createDataFrame(
        [("p0", np.arange(64, dtype="<i2").tobytes(), "pcm16", None)],
        "audio_id string, bytes binary, fmt string, sample_rate double")
    with _pytest.raises(Exception) as ei:
        audio_stats(df).collect()
    assert "pcm16 rows need a sample_rate" in str(ei.value)
