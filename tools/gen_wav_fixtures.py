"""Write the deterministic WAV fixtures under fixtures/wav/.

Sample values come from closed-form integer formulas over (frame index
i, channel c) so the DuckDB oracle for ``media_wav_window_stats`` can
recompute per-window sums-of-squares and peaks from generate_series —
fully independent of the decoder under test (which is CPython's own
stdlib ``wave`` parser; this pins bytes on disk -> stdlib parse ->
numpy -> windowed integer stats).

Formulas are pure integers in [-2048, 2047] (no float synthesis, no
rounding ambiguity). Rerunning is byte-stable; fixtures are committed.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from duckdb_hybrid_doc_search_spark.functions.wav import (decode_wav,
                                                          encode_wav)

# (name, n_frames, rate, per-channel formulas f(i) -> int16)
FIXTURES = [
    # mono, exactly 4 windows of 256 at hop 128 over 640 frames
    ("mono", 640, 8000, [
        lambda i: (i * 37 + 11) % 4096 - 2048,
    ]),
    # stereo with a ragged tail (last window shorter than 256)
    ("stereo", 500, 16000, [
        lambda i: (i * 53 + 7) % 4096 - 2048,
        lambda i: (i * 29 + 301) % 4096 - 2048,
    ]),
]


def build(n: int, chans) -> np.ndarray:
    out = np.zeros((n, len(chans)), dtype=np.int16)
    for c, f in enumerate(chans):
        for i in range(n):
            out[i, c] = f(i)
    return out


def main() -> None:
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "fixtures", "wav")
    os.makedirs(out_dir, exist_ok=True)
    for name, n, rate, chans in FIXTURES:
        samples = build(n, chans)
        data = encode_wav(samples, rate)
        back, brate = decode_wav(data)
        assert brate == rate and (back == samples).all(), name
        path = os.path.join(out_dir, f"{name}.wav")
        with open(path, "wb") as f:
            f.write(data)
        print(f"wrote {path} ({len(data)} bytes, {n} frames x "
              f"{len(chans)} ch @ {rate} Hz)")


if __name__ == "__main__":
    main()
