"""Write the deterministic PROGRESSIVE JPEG fixtures under
fixtures/jpeg_prog/.

Same exactness contract as tools/gen_jpeg_fixtures.py: at quality 100
the quantization tables are all ones and blockwise-constant planes are
DC-only, so the decode is bit-exact — progressive entropy coding is
lossless over the quantized coefficients, so the SOF2 scan script
(spectral selection + successive approximation + EOB runs,
functions/jpeg._progressive_scans) changes the BYTES but not the
decoded pixels. The DuckDB oracle for ``media_jpeg_progressive_stats``
mirrors these closed forms verbatim.

Block-value formulas (mirrored in plans/multimodal_queries.py):

- gray_prog.jpg   21x13, q100:  v = ((x//8)*23 + (y//8)*31 + 5) % 256
- ycc444_prog.jpg 24x16, q100 4:4:4:
  Y  = ((x//8)*11 + (y//8)*17 + 50) % 256
  Cb = ((x//8)*7  + (y//8)*5  + 85) % 256
  Cr = ((x//8)*3  + (y//8)*13 + 70) % 256
- ycc420_prog.jpg 32x32, q100 4:2:0, restart_interval=1:
  Y  = ((x//8)*15  + (y//8)*7   + 45) % 256
  Cb = ((x//16)*19 + (y//16)*11 + 75) % 256
  Cr = ((x//16)*9  + (y//16)*21 + 65) % 256

Rerunning is byte-stable (deterministic encoder); fixtures are
committed, the script documents their origin and VERIFIES decode ==
formula (and == the baseline encoding's decode) before writing.
"""

from __future__ import annotations

import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from duckdb_hybrid_doc_search_spark.functions.jpeg import (  # noqa: E402
    decode_jpeg, encode_jpeg, encode_jpeg_progressive,
    encode_jpeg_progressive_ycbcr, encode_jpeg_ycbcr)

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "fixtures", "jpeg_prog")


def _plane(w: int, h: int, f) -> np.ndarray:
    return np.array([[f(x, y) for x in range(w)] for y in range(h)],
                    dtype=np.int64)


def _jfif_rgb(yv: int, cbv: int, crv: int) -> tuple[int, int, int]:
    clip = lambda v: min(255, max(0, v))  # noqa: E731
    return (
        clip(math.floor(yv + 1.402 * (crv - 128) + 0.5)),
        clip(math.floor(yv - 0.344136 * (cbv - 128)
                        - 0.714136 * (crv - 128) + 0.5)),
        clip(math.floor(yv + 1.772 * (cbv - 128) + 0.5)),
    )


GRAY = lambda x, y: ((x // 8) * 23 + (y // 8) * 31 + 5) % 256  # noqa: E731

YCC444 = (
    lambda x, y: ((x // 8) * 11 + (y // 8) * 17 + 50) % 256,
    lambda x, y: ((x // 8) * 7 + (y // 8) * 5 + 85) % 256,
    lambda x, y: ((x // 8) * 3 + (y // 8) * 13 + 70) % 256,
)
YCC420 = (
    lambda x, y: ((x // 8) * 15 + (y // 8) * 7 + 45) % 256,
    lambda x, y: ((x // 16) * 19 + (y // 16) * 11 + 75) % 256,
    lambda x, y: ((x // 16) * 9 + (y // 16) * 21 + 65) % 256,
)


def main() -> None:
    os.makedirs(OUT, exist_ok=True)

    # gray_prog.jpg — partial edge blocks through the progressive path
    w, h = 21, 13
    gray = _plane(w, h, GRAY)
    data = encode_jpeg_progressive(gray.astype(np.uint8), quality=100)
    dec = decode_jpeg(data)
    assert dec.shape == (h, w, 1) and np.array_equal(dec[:, :, 0], gray)
    assert np.array_equal(
        dec, decode_jpeg(encode_jpeg(gray.astype(np.uint8), quality=100)))
    with open(os.path.join(OUT, "gray_prog.jpg"), "wb") as f:
        f.write(data)

    # ycc444_prog.jpg — exact RGB via the JFIF conversion formula
    w, h = 24, 16
    y, cb, cr = (_plane(w, h, f) for f in YCC444)
    data = encode_jpeg_progressive_ycbcr(y, cb, cr, quality=100,
                                         subsampling="444")
    dec = decode_jpeg(data)
    want = np.array([[_jfif_rgb(y[j, i], cb[j, i], cr[j, i])
                      for i in range(w)] for j in range(h)])
    assert dec.shape == (h, w, 3) and np.array_equal(dec, want)
    assert np.array_equal(dec, decode_jpeg(
        encode_jpeg_ycbcr(y, cb, cr, quality=100, subsampling="444")))
    with open(os.path.join(OUT, "ycc444_prog.jpg"), "wb") as f:
        f.write(data)

    # ycc420_prog.jpg — subsampled chroma + per-MCU restart markers in
    # every progressive scan, still exact
    w, h = 32, 32
    y, cb, cr = (_plane(w, h, f) for f in YCC420)
    data = encode_jpeg_progressive_ycbcr(y, cb, cr, quality=100,
                                         subsampling="420",
                                         restart_interval=1)
    dec = decode_jpeg(data)
    want = np.array([[_jfif_rgb(y[j, i], cb[j, i], cr[j, i])
                      for i in range(w)] for j in range(h)])
    assert dec.shape == (h, w, 3) and np.array_equal(dec, want)
    with open(os.path.join(OUT, "ycc420_prog.jpg"), "wb") as f:
        f.write(data)

    print(f"wrote 3 fixtures to {OUT}")


if __name__ == "__main__":
    main()
