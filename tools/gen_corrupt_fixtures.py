"""Write the dirty-media fixtures under fixtures/corrupt/.

A 100 TB media ingest WILL contain truncated files, wrong-format blobs,
and bit-rotted streams; a decoder that throws from inside a Spark task
fails the task (and after the retry budget, the JOB) on the first bad
payload. The permissive decode operator
(operators/multimodal.decode_stats_permissive) turns per-item codec
failures into DATA rows instead — these fixtures give its oracle one
file per failure class, plus healthy files IN THE SAME DIRECTORY to
prove good payloads still decode in the same scan:

- good.png / good.bmp — closed-form (x, y) pixels (oracle recomputes
  their sums from generate_series, as with every media fixture);
- trunc.bmp   — valid header, pixel array cut short (sniffs as bmp,
                decode raises);
- zlibbad.png — valid PNG structure, one corrupted byte inside the
                IDAT zlib stream (sniffs as png, inflate raises);
- noise.bin   — not any known magic (sniff itself refuses).

The generator ASSERTS each corrupt fixture actually fails decode at
write time, so a codec change that silently starts accepting one breaks
the regeneration, not just the oracle row. Rerunning is byte-stable.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from duckdb_hybrid_doc_search_spark.functions.bmp import decode_bmp, encode_bmp
from duckdb_hybrid_doc_search_spark.functions.png import decode_png, encode_png

GOOD_PNG = ("good.png", 6, 4, [
    lambda x, y: (x * 11 + y * 7) % 256,
    lambda x, y: (x * 5 + y * 13 + 19) % 256,
    lambda x, y: (x * 3 + y * 9 + 84) % 256,
])
GOOD_BMP = ("good.bmp", 5, 3, [
    lambda x, y: (x * 8 + y * 15) % 256,
    lambda x, y: (x * 6 + y * 2 + 47) % 256,
    lambda x, y: (x * 12 + y * 5 + 120) % 256,
])


def _build(w: int, h: int, chans) -> np.ndarray:
    img = np.zeros((h, w, len(chans)), dtype=np.uint8)
    for c, f in enumerate(chans):
        for y in range(h):
            for x in range(w):
                img[y, x, c] = f(x, y)
    return img


def main() -> None:
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "fixtures", "corrupt")
    os.makedirs(out_dir, exist_ok=True)

    name, w, h, chans = GOOD_PNG
    png_bytes = encode_png(_build(w, h, chans))
    assert (decode_png(png_bytes) == _build(w, h, chans)).all()
    with open(os.path.join(out_dir, name), "wb") as f:
        f.write(png_bytes)

    name, w, h, chans = GOOD_BMP
    bmp_bytes = encode_bmp(_build(w, h, chans))
    assert (decode_bmp(bmp_bytes) == _build(w, h, chans)).all()
    with open(os.path.join(out_dir, name), "wb") as f:
        f.write(bmp_bytes)

    trunc = bmp_bytes[:-10]  # pixel array shorter than h*stride
    try:
        decode_bmp(trunc)
        raise AssertionError("trunc.bmp unexpectedly decoded")
    except ValueError:
        pass
    with open(os.path.join(out_dir, "trunc.bmp"), "wb") as f:
        f.write(trunc)

    # corrupt one byte well inside the IDAT zlib stream (keep the PNG
    # signature + chunk layout intact so the sniff still says 'png')
    idat = png_bytes.find(b"IDAT")
    assert idat > 0
    pos = idat + 10
    zlibbad = (png_bytes[:pos]
               + bytes([png_bytes[pos] ^ 0xFF])
               + png_bytes[pos + 1:])
    try:
        decode_png(zlibbad)
        raise AssertionError("zlibbad.png unexpectedly decoded")
    except Exception:
        pass
    with open(os.path.join(out_dir, "zlibbad.png"), "wb") as f:
        f.write(zlibbad)

    # GIF pair (r9 review finding: the permissive path mis-routed
    # sniffed GIFs to the BMP codec and quarantined healthy files — a
    # good GIF in THIS corpus pins the dispatch table)
    from duckdb_hybrid_doc_search_spark.functions.gif import (decode_gif,
                                                              encode_gif)

    idx = np.array([[(x * 3 + y * 5) % 8 for x in range(4)]
                    for y in range(3)], dtype=np.uint8)
    pal = np.array([[(i * 9 + 1) % 256, (i * 4 + 60) % 256,
                     (i * 13 + 7) % 256] for i in range(8)], dtype=np.uint8)
    gif_bytes = encode_gif(idx, pal)
    assert (decode_gif(gif_bytes) == pal[idx]).all()
    with open(os.path.join(out_dir, "good.gif"), "wb") as f:
        f.write(gif_bytes)
    trunc_gif = gif_bytes[:-6]  # LZW stream cut mid-code
    try:
        decode_gif(trunc_gif)
        raise AssertionError("trunc.gif unexpectedly decoded")
    except ValueError:
        pass
    with open(os.path.join(out_dir, "trunc.gif"), "wb") as f:
        f.write(trunc_gif)

    with open(os.path.join(out_dir, "noise.bin"), "wb") as f:
        f.write(b"NOTANIMAGE" + bytes(range(200)))

    for n in sorted(os.listdir(out_dir)):
        print("wrote", n, os.path.getsize(os.path.join(out_dir, n)), "bytes")


if __name__ == "__main__":
    main()
