"""Stdlib-wave WAV path (functions/wav.py + wav_window_stats): encode/
decode round-trips, error cases, fixture/formula contract, and the
windowing invariants behind the ``media_wav_window_stats`` oracle."""

from __future__ import annotations

import os

import numpy as np
import pytest

from duckdb_hybrid_doc_search_spark.functions.wav import (decode_wav,
                                                          encode_wav)

_FIX_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "fixtures", "wav")


@pytest.mark.parametrize("n,ch,rate", [(1, 1, 8000), (640, 1, 8000),
                                       (500, 2, 16000), (37, 3, 44100)])
def test_roundtrip(n, ch, rate):
    rng = np.random.default_rng(n + ch)
    s = rng.integers(-32768, 32768, size=(n, ch)).astype(np.int16)
    back, brate = decode_wav(encode_wav(s, rate))
    assert brate == rate and (back == s).all()


def test_error_cases():
    with pytest.raises(ValueError, match="not a WAV"):
        decode_wav(b"\x00" * 64)
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:  # 8-bit PCM: unsupported width
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(8000)
        w.writeframes(b"\x80" * 16)
    with pytest.raises(ValueError, match="sample width"):
        decode_wav(buf.getvalue())


def test_fixtures_match_generator_formulas():
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from tools.gen_wav_fixtures import FIXTURES, build

    for name, n, rate, chans in FIXTURES:
        with open(os.path.join(_FIX_DIR, f"{name}.wav"), "rb") as f:
            samples, brate = decode_wav(f.read())
        assert brate == rate
        assert (samples == build(n, chans)).all(), name


def test_wav_window_stats_invariants(spark):
    """Windowing over the fixtures: hop-128 starts, ragged tail kept,
    per-window integer stats consistent with a direct numpy recompute."""
    from duckdb_hybrid_doc_search_spark.operators.multimodal import (
        WAV_HOP_FRAMES, WAV_WINDOW_FRAMES, wav_window_stats)

    rows = wav_window_stats(spark, _FIX_DIR).collect()
    by_file: dict[str, list] = {}
    for r in rows:
        by_file.setdefault(r["file_name"], []).append(r)
    # mono.wav: 640 frames -> starts 0,128,256,384,512; tail 128 frames
    mono = [r for r in by_file["mono.wav"] if r["channel"] == 0]
    assert [r["start_frame"] for r in mono] == [0, 128, 256, 384, 512]
    assert [r["n_frames"] for r in mono] == [256, 256, 256, 256, 128]
    # stereo.wav: 500 frames -> starts 0,128,256,384; tails 244, 116
    st0 = [r for r in by_file["stereo.wav"] if r["channel"] == 0]
    assert [r["n_frames"] for r in st0] == [256, 256, 244, 116]
    # spot-recompute one window directly from the file
    with open(os.path.join(_FIX_DIR, "mono.wav"), "rb") as f:
        samples, _ = decode_wav(f.read())
    w = samples[128:128 + WAV_WINDOW_FRAMES, 0].astype(np.int64)
    target = next(r for r in mono if r["start_frame"] == WAV_HOP_FRAMES)
    assert target["sum_sq"] == int((w * w).sum())
    assert target["peak"] == int(np.abs(w).max())


def test_audio_window_features_wav_pure_backend(spark):
    """The framing operator's decode seam accepts real WAV bytes: rms
    and peak of the first mono.wav window must match a direct numpy
    recompute on the stdlib-decoded samples."""
    from pyspark.sql import functions as F

    from duckdb_hybrid_doc_search_spark.operators.multimodal import (
        AUDIO_WINDOW_BYTES, audio_window_features)

    files = spark.read.format("binaryFile").load(_FIX_DIR + "/mono.wav")
    media = files.select(
        F.lit("mono").alias("media_id"),
        F.lit("audio").alias("kind"),
        F.col("content").alias("payload"),
    )
    rows = {r["window_idx"]: r for r in
            audio_window_features(media, decode_backend="wav_pure")
            .collect()}
    with open(os.path.join(_FIX_DIR, "mono.wav"), "rb") as f:
        samples, _ = decode_wav(f.read())
    w = samples[:AUDIO_WINDOW_BYTES, 0].astype(np.float64)
    assert rows[0]["rms"] == round(float(np.sqrt((w * w).mean())), 6)
    assert rows[0]["peak"] == round(float(np.abs(w).max()), 6)
