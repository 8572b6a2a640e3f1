"""Write the deterministic PNG fixtures under fixtures/png/.

Pixel values come from closed-form formulas over (x, y) so the DuckDB
oracle for ``media_png_decode_stats`` can recompute the expected channel
sums from generate_series — fully independent of the PNG codec under
test: formula -> encode_png (mixed filters, all five types) -> bytes on
disk -> decode_png -> sums must equal the formula sums.

Rerunning this script must be byte-stable (zlib level 9, fixed filter
assignment); fixtures are committed, the script documents their origin.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from duckdb_hybrid_doc_search_spark.functions.png import (decode_png,
                                                          encode_png)

# (name, width, height, per-channel formulas f(x, y) -> 0..255)
FIXTURES = [
    ("rgb", 16, 12, [
        lambda x, y: (x * 7 + y * 13) % 256,
        lambda x, y: (x * 3 + y * 5 + 31) % 256,
        lambda x, y: (x * 11 + y * 2 + 101) % 256,
    ]),
    ("gray", 9, 7, [
        lambda x, y: (x * 17 + y * 29 + 3) % 256,
    ]),
    ("rgba", 8, 5, [
        lambda x, y: (x * 5 + y * 3) % 256,
        lambda x, y: (x + y * 7 + 11) % 256,
        lambda x, y: (x * 13 + y + 29) % 256,
        lambda x, y: (x * 2 + y * 19 + 128) % 256,
    ]),
]


def build(name: str, w: int, h: int, chans) -> np.ndarray:
    img = np.zeros((h, w, len(chans)), dtype=np.uint8)
    for c, f in enumerate(chans):
        for y in range(h):
            for x in range(w):
                img[y, x, c] = f(x, y)
    return img


def main() -> None:
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "fixtures", "png")
    os.makedirs(out_dir, exist_ok=True)
    for name, w, h, chans in FIXTURES:
        img = build(name, w, h, chans)
        data = encode_png(img, filter_mode="mixed")
        back = decode_png(data)
        assert (back == img).all(), name  # self-check before writing
        path = os.path.join(out_dir, f"{name}.png")
        with open(path, "wb") as f:
            f.write(data)
        print(f"{path}: {w}x{h}x{len(chans)} {len(data)} bytes, "
              f"sums={[int(img[:, :, c].sum()) for c in range(len(chans))]}")


if __name__ == "__main__":
    main()
