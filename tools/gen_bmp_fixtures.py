"""Write the deterministic BMP fixtures under fixtures/bmp/.

Pixel values come from closed-form formulas over (x, y) so the DuckDB
oracle for ``media_bmp_decode_stats`` can recompute the expected channel
sums from generate_series — fully independent of the BMP codec under
test: formula -> encode_bmp -> bytes on disk -> decode_bmp -> sums must
equal the formula sums.

Widths are chosen so the 24-bit rows NEED 4-byte padding (w=5 -> 15
bytes/row, 1 pad; w=7 -> 21 bytes/row, 3 pad), and one fixture is
written top-down (negative height) — the three layout rules (padding,
vertical flip, BGR swizzle) each have a fixture that breaks if the
decoder gets them wrong. Rerunning is byte-stable; fixtures are
committed, the script documents their origin.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from duckdb_hybrid_doc_search_spark.functions.bmp import (decode_bmp,
                                                          encode_bmp)

# (name, width, height, top_down, per-channel formulas f(x, y) -> 0..255)
FIXTURES = [
    # bottom-up 24-bit, 1 pad byte per row: padding + flip + swizzle
    ("rgb_up", 5, 6, False, [
        lambda x, y: (x * 9 + y * 4) % 256,
        lambda x, y: (x * 2 + y * 11 + 7) % 256,
        lambda x, y: (x * 6 + y * 3 + 55) % 256,
    ]),
    # top-down 24-bit (negative height), 3 pad bytes per row
    ("rgb_down", 7, 4, True, [
        lambda x, y: (x * 12 + y * 5 + 17) % 256,
        lambda x, y: (x * 4 + y * 9 + 40) % 256,
        lambda x, y: (x * 8 + y * 7 + 90) % 256,
    ]),
    # bottom-up 32-bit BGRA (no padding needed at any width)
    ("rgba_up", 6, 3, False, [
        lambda x, y: (x * 14 + y * 6) % 256,
        lambda x, y: (x * 3 + y * 13 + 22) % 256,
        lambda x, y: (x * 10 + y + 66) % 256,
        lambda x, y: (x + y * 17 + 200) % 256,
    ]),
]


def build(w: int, h: int, chans) -> np.ndarray:
    img = np.zeros((h, w, len(chans)), dtype=np.uint8)
    for c, f in enumerate(chans):
        for y in range(h):
            for x in range(w):
                img[y, x, c] = f(x, y)
    return img


def main() -> None:
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "fixtures", "bmp")
    os.makedirs(out_dir, exist_ok=True)
    for name, w, h, top_down, chans in FIXTURES:
        img = build(w, h, chans)
        data = encode_bmp(img, top_down=top_down)
        back = decode_bmp(data)
        assert (back == img).all(), f"round-trip mismatch for {name}"
        path = os.path.join(out_dir, f"{name}.bmp")
        with open(path, "wb") as f:
            f.write(data)
        print(f"wrote {path} ({len(data)} bytes, "
              f"{w}x{h}x{len(chans)}, top_down={top_down})")


if __name__ == "__main__":
    main()
