"""Write the deterministic ANIMATED GIF fixtures under fixtures/gifanim/.

Same independence contract as tools/gen_gif_fixtures.py, extended to the
animation layer: frame indices and palettes are closed-form formulas, so
the DuckDB oracle for ``media_gif_frames`` recomputes each COMPOSITED
frame's channel sums from generate_series + CASE — fully independent of
the codec. The three fixtures pin the three composition rules:

- frames3.gif — three FULL-canvas frames, no GCE at all (the no-control
  path): each frame replaces the whole canvas.
- patch.gif — full first frame, then a smaller second frame at a
  (left, top) OFFSET with its own LOCAL color table (disposal 1 / keep):
  the composited second frame is frame 0 with the patch rect overwritten
  through the local palette.
- trans.gif — full first frame, then a full overlay frame whose
  transparent index T leaves the underlying pixels: the composited
  second frame mixes both palettes' values per-pixel via the index
  formula.

The generator asserts decode_gif_frames reproduces the numpy-side
composition of the same formulas before writing, so a stale fixture can
never sit quietly behind the oracle. Rerunning is byte-stable.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from duckdb_hybrid_doc_search_spark.functions.gif import (decode_gif_frames,
                                                          encode_gif_frames)

PAL = np.array([[(i * 5) % 256, (i * 11 + 4) % 256, (i * 2 + 9) % 256]
                for i in range(16)], dtype=np.uint8)
LOCAL_PAL = np.array([[(i * 7 + 3) % 256, (i * 9 + 50) % 256,
                       (i * 13 + 5) % 256] for i in range(16)],
                     dtype=np.uint8)


def _grid(w: int, h: int, f) -> np.ndarray:
    return np.array([[f(x, y) for x in range(w)] for y in range(h)],
                    dtype=np.uint8)


def main() -> None:
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "fixtures", "gifanim")
    os.makedirs(out_dir, exist_ok=True)

    # frames3.gif: 8x5 canvas, 3 full frames, global palette only
    fr = [_grid(8, 5, lambda x, y, t=t: (x * 3 + y * 7 + t * 5) % 16)
          for t in range(3)]
    data = encode_gif_frames([{"indices": a} for a in fr], (8, 5), PAL)
    got = decode_gif_frames(data)
    assert got.shape == (3, 5, 8, 3)
    for t in range(3):
        assert (got[t] == PAL[fr[t]]).all(), f"frames3 frame {t}"
    _write(out_dir, "frames3.gif", data)

    # patch.gif: 8x6 canvas; frame 0 full; frame 1 = 4x3 patch at (2, 1)
    # with a LOCAL palette, disposal 1 (keep)
    g0 = _grid(8, 6, lambda x, y: (x * 2 + y * 3) % 16)
    gp = _grid(4, 3, lambda u, v: (u * 5 + v * 2 + 1) % 16)
    data = encode_gif_frames(
        [{"indices": g0},
         {"indices": gp, "left": 2, "top": 1, "palette": LOCAL_PAL,
          "disposal": 1}],
        (8, 6), PAL)
    got = decode_gif_frames(data)
    exp1 = PAL[g0].copy()
    exp1[1:4, 2:6] = LOCAL_PAL[gp]
    assert (got[0] == PAL[g0]).all() and (got[1] == exp1).all(), "patch"
    _write(out_dir, "patch.gif", data)

    # trans.gif: 6x4 canvas; frame 0 full; frame 1 full overlay with
    # transparent index 7 keeping frame 0's pixels where it occurs
    h0 = _grid(6, 4, lambda x, y: (x + y * 2) % 16)
    h1 = _grid(6, 4, lambda x, y: (x * 3 + y) % 16)
    data = encode_gif_frames(
        [{"indices": h0}, {"indices": h1, "transparent": 7}], (6, 4), PAL)
    got = decode_gif_frames(data)
    exp1 = np.where((h1 == 7)[:, :, None], PAL[h0], PAL[h1])
    assert (got[0] == PAL[h0]).all() and (got[1] == exp1).all(), "trans"
    _write(out_dir, "trans.gif", data)

    # restore.gif: 7x5 canvas; frame 0 full; frame 1 = 3x2 patch at
    # (1, 1) with DISPOSAL 3 (restore-to-previous); frame 2 = 2x1 patch
    # at (4, 3). Frame 2's composited canvas must show frame 0's pixels
    # under the frame-1 rect (the post-frame restore), plus its own rect.
    r0 = _grid(7, 5, lambda x, y: (x * 2 + y * 5) % 16)
    r1 = _grid(3, 2, lambda u, v: (u * 4 + v * 3 + 2) % 16)
    r2 = _grid(2, 1, lambda u, v: (u + 6) % 16)
    data = encode_gif_frames(
        [{"indices": r0},
         {"indices": r1, "left": 1, "top": 1, "disposal": 3},
         {"indices": r2, "left": 4, "top": 3}],
        (7, 5), PAL)
    got = decode_gif_frames(data)
    exp1 = PAL[r0].copy()
    exp1[1:3, 1:4] = PAL[r1]
    exp2 = PAL[r0].copy()          # frame-1 rect RESTORED to frame 0
    exp2[3, 4:6] = PAL[r2]
    assert (got[0] == PAL[r0]).all(), "restore f0"
    assert (got[1] == exp1).all(), "restore f1"
    assert (got[2] == exp2).all(), "restore f2 (disposal-3 restore)"
    _write(out_dir, "restore.gif", data)


def _write(out_dir: str, name: str, data: bytes) -> None:
    path = os.path.join(out_dir, name)
    with open(path, "wb") as f:
        f.write(data)
    print(f"wrote {path} ({len(data)} bytes)")


if __name__ == "__main__":
    main()
