"""Write the deterministic GIF fixtures under fixtures/gif/.

Indices are closed-form formulas over (x, y) and the palettes are
closed-form over the index, so the DuckDB oracle for
``media_gif_decode_stats`` recomputes each channel sum as
sum(palette_c(index_formula(x, y))) from generate_series — fully
independent of the GIF codec under test: formula -> encode_gif -> bytes
on disk -> decode_gif -> sums must equal the formula sums through BOTH
the LZW layer and the palette indirection (a palette mix-up permutes
colors without touching a single index, which is exactly what the
per-channel sums catch).

One fixture is interlaced (8/8/4/2 row passes) and one carries a LOCAL
color table (the local-wins rule). Rerunning is byte-stable.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from duckdb_hybrid_doc_search_spark.functions.gif import decode_gif, encode_gif

# (name, w, h, interlace, local, index formula f(x,y) -> 0..15,
#  palette formulas p_c(i) -> 0..255)
FIXTURES = [
    ("plain", 8, 5, False, False,
     lambda x, y: (x * 3 + y * 7) % 16,
     [lambda i: (i * 5) % 256, lambda i: (i * 11 + 4) % 256,
      lambda i: (i * 2 + 9) % 256]),
    ("inter", 7, 9, True, False,
     lambda x, y: (x * 5 + y * 3 + 1) % 16,
     [lambda i: (i * 13 + 2) % 256, lambda i: (i * 3 + 77) % 256,
      lambda i: (i * 9 + 30) % 256]),
    ("localpal", 6, 4, False, True,
     lambda x, y: (x * 2 + y * 5) % 16,
     [lambda i: (i * 7 + 11) % 256, lambda i: (i * 15) % 256,
      lambda i: (i * 4 + 90) % 256]),
]


def main() -> None:
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "fixtures", "gif")
    os.makedirs(out_dir, exist_ok=True)
    for name, w, h, interlace, local, f, pal in FIXTURES:
        idx = np.array([[f(x, y) for x in range(w)] for y in range(h)],
                       dtype=np.uint8)
        palette = np.array([[p(i) for p in pal] for i in range(16)],
                           dtype=np.uint8)
        data = encode_gif(idx, palette, interlace=interlace, local=local)
        assert (decode_gif(data) == palette[idx]).all(), name
        path = os.path.join(out_dir, f"{name}.gif")
        with open(path, "wb") as fobj:
            fobj.write(data)
        print(f"wrote {path} ({len(data)} bytes, {w}x{h}, "
              f"interlace={interlace}, local={local})")


if __name__ == "__main__":
    main()
