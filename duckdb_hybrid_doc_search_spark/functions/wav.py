"""Real WAV (RIFF PCM) decode via the stdlib ``wave`` module.

The third real bytes->samples media path in this container (after the
PNG and BMP codecs) and the first AUDIO one: ``wave`` is in the Python
standard library, so unlike the image formats nothing is hand-rolled —
the parser under test is CPython's own RIFF/WAVE reader, and this module
only converts frames to numpy and back. 16-bit signed little-endian PCM
(the overwhelmingly common training-audio interchange shape); the
encoder exists for deterministic fixtures (tools/gen_wav_fixtures.py).
"""

from __future__ import annotations

import io
import wave

import numpy as np


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> ((n_frames, n_channels) int16 array, sample_rate).

    Raises ValueError on non-WAV bytes or non-16-bit PCM."""
    try:
        with wave.open(io.BytesIO(data)) as w:
            if w.getsampwidth() != 2:
                raise ValueError(
                    f"unsupported sample width {w.getsampwidth()} "
                    "(only 16-bit PCM)"
                )
            n_ch = w.getnchannels()
            rate = w.getframerate()
            frames = w.readframes(w.getnframes())
    # wave.open raises EOFError (from the chunk module) on truncated
    # RIFF data, not wave.Error — both are "not a decodable WAV" to
    # callers sorting dirty media
    except (wave.Error, EOFError) as exc:
        raise ValueError(f"not a WAV: {exc}") from exc
    samples = np.frombuffer(frames, dtype="<i2").reshape(-1, n_ch)
    return samples, rate


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """(n_frames, n_channels) int16 -> WAV bytes (16-bit PCM LE)."""
    if samples.ndim != 2 or samples.dtype != np.int16:
        raise ValueError("encode_wav expects (n_frames, n_channels) int16")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(samples.shape[1])
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()
