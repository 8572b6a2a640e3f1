"""Write the deterministic JPEG fixtures under fixtures/jpeg/.

A lossy codec can still sit behind exact-integer SQL oracles: at
quality 100 the scaled Annex-K quantization tables are all ones, and an
image CONSTANT within each 8x8 block (16x16 for 4:2:0 chroma) has
DC-only DCT blocks whose round-trip is bit-exact
(functions/jpeg.py docstring). The color fixtures are authored directly
in YCbCr space (encode_jpeg_ycbcr), so the decoded RGB is the exact
JFIF floor(x+0.5) conversion of the block formulas — which the DuckDB
oracle for ``media_jpeg_decode_stats`` mirrors verbatim.

Block-value formulas (mirrored in plans/multimodal_queries.py):

- gray.jpg   21x13, q100:  v  = ((x//8)*17 + (y//8)*29 +  3) % 256
  (non-multiple-of-8 dims: partial edge blocks exercised)
- ycc444.jpg 24x16, q100 4:4:4:
  Y = ((x//8)*13 + (y//8)*7  + 40) % 256
  Cb = ((x//8)*5 + (y//8)*3  + 90) % 256
  Cr = ((x//8)*2 + (y//8)*11 + 60) % 256
- ycc420.jpg 32x32, q100 4:2:0, restart_interval=1 (RSTn markers):
  Y = ((x//8)*19 + (y//8)*9 + 35) % 256
  Cb = ((x//16)*21 + (y//16)*13 + 80) % 256
  Cr = ((x//16)*7 + (y//16)*23 + 55) % 256

Rerunning is byte-stable (deterministic encoder); fixtures are
committed, the script documents their origin and VERIFIES decode ==
formula before writing.
"""

from __future__ import annotations

import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from duckdb_hybrid_doc_search_spark.functions.jpeg import (  # noqa: E402
    decode_jpeg, encode_jpeg, encode_jpeg_ycbcr)

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "fixtures", "jpeg")


def _plane(w: int, h: int, f) -> np.ndarray:
    return np.array([[f(x, y) for x in range(w)] for y in range(h)],
                    dtype=np.int64)


def _jfif_rgb(yv: int, cbv: int, crv: int) -> tuple[int, int, int]:
    """The decoder's exact conversion (functions/jpeg._ycbcr_to_rgb)."""
    clip = lambda v: min(255, max(0, v))  # noqa: E731
    return (
        clip(math.floor(yv + 1.402 * (crv - 128) + 0.5)),
        clip(math.floor(yv - 0.344136 * (cbv - 128)
                        - 0.714136 * (crv - 128) + 0.5)),
        clip(math.floor(yv + 1.772 * (cbv - 128) + 0.5)),
    )


GRAY = lambda x, y: ((x // 8) * 17 + (y // 8) * 29 + 3) % 256  # noqa: E731

YCC444 = (
    lambda x, y: ((x // 8) * 13 + (y // 8) * 7 + 40) % 256,
    lambda x, y: ((x // 8) * 5 + (y // 8) * 3 + 90) % 256,
    lambda x, y: ((x // 8) * 2 + (y // 8) * 11 + 60) % 256,
)
YCC420 = (
    lambda x, y: ((x // 8) * 19 + (y // 8) * 9 + 35) % 256,
    lambda x, y: ((x // 16) * 21 + (y // 16) * 13 + 80) % 256,
    lambda x, y: ((x // 16) * 7 + (y // 16) * 23 + 55) % 256,
)


def main() -> None:
    os.makedirs(OUT, exist_ok=True)

    # gray.jpg — exact gray round-trip incl. partial edge blocks
    w, h = 21, 13
    gray = _plane(w, h, GRAY)
    data = encode_jpeg(gray.astype(np.uint8), quality=100)
    dec = decode_jpeg(data)
    assert dec.shape == (h, w, 1) and np.array_equal(dec[:, :, 0], gray)
    with open(os.path.join(OUT, "gray.jpg"), "wb") as f:
        f.write(data)

    # ycc444.jpg — exact RGB via the JFIF conversion formula
    w, h = 24, 16
    y, cb, cr = (_plane(w, h, f) for f in YCC444)
    data = encode_jpeg_ycbcr(y, cb, cr, quality=100, subsampling="444")
    dec = decode_jpeg(data)
    want = np.array([[_jfif_rgb(y[j, i], cb[j, i], cr[j, i])
                      for i in range(w)] for j in range(h)])
    assert dec.shape == (h, w, 3) and np.array_equal(dec, want)
    with open(os.path.join(OUT, "ycc444.jpg"), "wb") as f:
        f.write(data)

    # ycc420.jpg — subsampled chroma + restart markers, still exact
    w, h = 32, 32
    y, cb, cr = (_plane(w, h, f) for f in YCC420)
    data = encode_jpeg_ycbcr(y, cb, cr, quality=100, subsampling="420",
                             restart_interval=1)
    dec = decode_jpeg(data)
    want = np.array([[_jfif_rgb(y[j, i], cb[j, i], cr[j, i])
                      for i in range(w)] for j in range(h)])
    assert dec.shape == (h, w, 3) and np.array_equal(dec, want)
    with open(os.path.join(OUT, "ycc420.jpg"), "wb") as f:
        f.write(data)

    print(f"wrote 3 fixtures to {OUT}")


if __name__ == "__main__":
    main()
