"""Write the deterministic concatenated-BMP video containers under
fixtures/bmpv/.

A .bmpv container is nothing but back-to-back BMP files (each frame
self-delimiting via the BITMAPFILEHEADER's file-size field), so the
REAL video-frame extraction path — demux (functions/bmp.
split_bmp_container) then per-frame decode (decode_bmp) — runs on real
bytes with zero non-stdlib dependencies. Pixel values are closed-form
formulas over (x, y, t) where t is the SOURCE frame index, so the
DuckDB oracle for ``media_video_frames`` recomputes each sampled
frame's RGB byte sum from generate_series — fully independent of the
container splitter and codec under test.

Frame counts differ per container (5 / 8 / 3) so 4-sample extraction
exercises stride > 1, stride < 1 (duplicate source frames), and exact
division; one container's frames are 32-bit (alpha dropped by _as_rgb)
and one is written top-down. Rerunning is byte-stable; fixtures are
committed, the script documents their origin.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from duckdb_hybrid_doc_search_spark.functions.bmp import (
    decode_bmp, encode_bmp, split_bmp_container)

# (name, width, height, n_frames, top_down, 32-bit?,
#  per-channel formulas f(x, y, t) -> 0..255)
FIXTURES = [
    ("clip5", 4, 3, 5, False, False, [
        lambda x, y, t: (x * 7 + y * 3 + t * 11) % 256,
        lambda x, y, t: (x * 2 + y * 9 + t * 5 + 40) % 256,
        lambda x, y, t: (x * 5 + y * 6 + t * 17 + 90) % 256,
    ]),
    ("clip8", 5, 2, 8, True, False, [
        lambda x, y, t: (x * 13 + y * 4 + t * 3 + 8) % 256,
        lambda x, y, t: (x * 6 + y * 14 + t * 7 + 61) % 256,
        lambda x, y, t: (x * 9 + y + t * 19 + 130) % 256,
    ]),
    ("clip3", 3, 4, 3, False, True, [
        lambda x, y, t: (x * 10 + y * 5 + t * 23) % 256,
        lambda x, y, t: (x * 4 + y * 12 + t * 9 + 33) % 256,
        lambda x, y, t: (x * 8 + y * 2 + t * 13 + 77) % 256,
        lambda x, y, t: (x + y * 7 + t * 29 + 180) % 256,  # alpha
    ]),
]


def build_frame(w: int, h: int, t: int, chans) -> np.ndarray:
    img = np.zeros((h, w, len(chans)), dtype=np.uint8)
    for c, f in enumerate(chans):
        for y in range(h):
            for x in range(w):
                img[y, x, c] = f(x, y, t)
    return img


def main() -> None:
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "fixtures", "bmpv")
    os.makedirs(out_dir, exist_ok=True)
    for name, w, h, n, top_down, rgba, chans in FIXTURES:
        frames = [build_frame(w, h, t, chans) for t in range(n)]
        data = b"".join(encode_bmp(f, top_down=top_down) for f in frames)
        back = split_bmp_container(data)
        assert len(back) == n, f"{name}: demux frame-count mismatch"
        for t, blob in enumerate(back):
            assert (decode_bmp(blob) == frames[t]).all(), \
                f"{name}: round-trip mismatch at frame {t}"
        path = os.path.join(out_dir, f"{name}.bmpv")
        with open(path, "wb") as f:
            f.write(data)
        print(f"wrote {path} ({len(data)} bytes, {n} frames of "
              f"{w}x{h}x{len(chans)}, top_down={top_down})")


if __name__ == "__main__":
    main()
