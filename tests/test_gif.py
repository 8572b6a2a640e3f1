"""Pure-stdlib GIF codec (functions/gif.py): LZW round-trips with
dictionary growth, interlace and local-palette rules, INDEPENDENT
artifacts (the canonical published 1x1 GIF bytes; a hand-packed LZW
worked example neither the encoder nor decoder produced), and error
paths."""

from __future__ import annotations

import base64

import numpy as np
import pytest

from duckdb_hybrid_doc_search_spark.functions.gif import (
    _lzw_decode, decode_gif, encode_gif)


def _img(w: int, h: int, f) -> np.ndarray:
    return np.array([[f(x, y) for x in range(w)] for y in range(h)],
                    dtype=np.uint8)


@pytest.mark.parametrize("interlace", [False, True])
@pytest.mark.parametrize("local", [False, True])
def test_roundtrip_small(interlace, local):
    idx = _img(5, 7, lambda x, y: (x * 3 + y * 5) % 8)
    palette = np.array([[i * 31 % 256, i * 7, i * 13 + 5] for i in range(8)],
                       dtype=np.uint8)
    data = encode_gif(idx, palette, interlace=interlace, local=local)
    assert (decode_gif(data) == palette[idx]).all()


def test_roundtrip_forces_code_width_growth():
    """32x24 = 768 varied pixels over a 256-entry palette: the LZW
    dictionary passes 512 entries, so both sides must take the 9->10 bit
    width bump at the same point in the stream (the +1 asymmetry)."""
    rng = np.random.default_rng(11)
    idx = rng.integers(0, 256, size=(24, 32), dtype=np.uint8)
    palette = np.stack([np.arange(256), (np.arange(256) * 2) % 256,
                        (np.arange(256) * 7 + 3) % 256],
                       axis=1).astype(np.uint8)
    data = encode_gif(idx, palette)
    assert (decode_gif(data) == palette[idx]).all()


def test_canonical_published_1x1_gif():
    """Independent artifact: the widely-published 35-byte transparent
    1x1 GIF (not produced by our encoder). Its lone pixel is palette
    index 0 = black; its LZW stream ends flush with the data (no
    readable END code), pinning the stop-at-n-pixels rule."""
    data = base64.b64decode(
        "R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7"
    )
    img = decode_gif(data)
    assert img.shape == (1, 1, 3)
    assert (img == 0).all()


def test_hand_packed_lzw_worked_example():
    """LZW stream packed BY HAND (spec-style worked example): indices
    [1, 1, 2, 2, 1, 1] with min_code_size=2 encode as codes
    clear(4), 1, 1, 2, then — after the third data code's dictionary
    add fills the 3-bit space (entries 6,7,8) — 2, 6(=the '1 1'
    entry), end(5) at FOUR bits, LSB-first. Neither our encoder nor
    decoder produced these bytes; a decoder bit-order, width-bump, or
    dictionary-offset bug cannot pass this and the round-trips at
    once."""
    codes = [(4, 3), (1, 3), (1, 3), (2, 3), (2, 4), (6, 4), (5, 4)]
    bits = [(c >> i) & 1 for c, width in codes for i in range(width)]
    packed = bytes(
        sum(b << j for j, b in enumerate(bits[i:i + 8]))
        for i in range(0, len(bits), 8)
    )
    assert _lzw_decode(2, packed, 6) == [1, 1, 2, 2, 1, 1]


def test_local_palette_wins_over_global():
    """A local color table must override the global one: same indices,
    different palettes, decoded colors follow the LOCAL table."""
    idx = _img(4, 3, lambda x, y: (x + y) % 4)
    glob_pal = np.zeros((4, 3), dtype=np.uint8)
    loc_pal = np.array([[10, 20, 30], [40, 50, 60], [70, 80, 90],
                        [100, 110, 120]], dtype=np.uint8)
    data = bytearray(encode_gif(idx, loc_pal, local=True))
    # splice a GLOBAL table in front (flag bit + 12 palette bytes) while
    # keeping the local one — decoder must still use the local colors
    data[10] |= 0x80 | 0x01  # global table present, 4 entries
    spliced = bytes(data[:13]) + glob_pal.tobytes() + bytes(data[13:])
    assert (decode_gif(spliced) == loc_pal[idx]).all()


def test_error_paths():
    idx = _img(3, 2, lambda x, y: (x + y) % 2)
    pal = np.array([[0, 0, 0], [255, 255, 255]], dtype=np.uint8)
    good = encode_gif(idx, pal)
    with pytest.raises(ValueError, match="bad signature"):
        decode_gif(b"NOTGIF" + good[6:])
    with pytest.raises(ValueError, match="truncated|trailer|index"):
        decode_gif(good[:-6])
    # multi-frame: splice the image block in twice
    img_start = good.index(b"\x2c")
    two = good[:-1] + good[img_start:-1] + b"\x3b"
    with pytest.raises(ValueError, match="multi-frame"):
        decode_gif(two)


def test_encoder_rejects_bad_palette():
    idx = _img(2, 2, lambda x, y: 0)
    with pytest.raises(ValueError, match="power of two"):
        encode_gif(idx, np.zeros((3, 3), dtype=np.uint8))


# --- animation (multi-frame) ---------------------------------------------------


def test_hand_packed_multiframe_gif():
    """A two-frame GIF89a packed BYTE BY BYTE from the spec (neither the
    encoder nor decoder produced it): full 2x2 first frame, then a 1x1
    patch at (1,1) behind a disposal-1 graphic-control extension. Pins
    the animation block walk, GCE parsing, and rect composition against
    an independent artifact."""
    import struct

    from duckdb_hybrid_doc_search_spark.functions.gif import (
        decode_gif_frames)

    pal = np.array([[10, 20, 30], [40, 50, 60], [70, 80, 90],
                    [200, 210, 220]], dtype=np.uint8)
    data = bytearray(b"GIF89a")
    data += struct.pack("<HHBBB", 2, 2, 0x81, 0, 0)   # screen + GCT flag
    data += pal.tobytes()
    # frame 1: indices [[0,1],[2,3]] — LZW hand-packed: codes 4(clear),
    # 0,1,2 at width 3, then 3 and 5(end) at width 4 -> bytes 44 34 05
    data += struct.pack("<BHHHHB", 0x2C, 0, 0, 2, 2, 0)
    data += bytes([2, 3, 0x44, 0x34, 0x05, 0x00])
    # GCE: disposal 1 (keep), no transparency
    data += bytes([0x21, 0xF9, 0x04, 0x04, 0, 0, 0, 0])
    # frame 2: 1x1 index [1] at (1,1) — codes 4(clear),1,5(end) at
    # width 3 -> bytes 4C 01
    data += struct.pack("<BHHHHB", 0x2C, 1, 1, 1, 1, 0)
    data += bytes([2, 2, 0x4C, 0x01, 0x00])
    data += b"\x3b"

    frames = decode_gif_frames(bytes(data))
    assert frames.shape == (2, 2, 2, 3)
    assert (frames[0] == pal[np.array([[0, 1], [2, 3]])]).all()
    exp1 = pal[np.array([[0, 1], [2, 3]])].copy()
    exp1[1, 1] = pal[1]
    assert (frames[1] == exp1).all()


def _pal16():
    return np.array([[i * 9 % 256, i * 5 + 1, i * 3 + 7]
                     for i in range(16)], dtype=np.uint8)


def test_animation_roundtrip_disposal_and_transparency():
    from duckdb_hybrid_doc_search_spark.functions.gif import (
        decode_gif_frames, encode_gif_frames)

    pal = _pal16()
    f0 = _img(6, 5, lambda x, y: (x * 2 + y) % 16)
    patch = _img(3, 2, lambda x, y: (x + y * 4 + 2) % 16)
    # disposal 2: after the patch frame shows, its rect restores to the
    # background color (index 3) for the NEXT frame's base
    data = encode_gif_frames(
        [{"indices": f0},
         {"indices": patch, "left": 1, "top": 2, "disposal": 2},
         {"indices": _img(1, 1, lambda x, y: 5), "left": 0, "top": 0}],
        (6, 5), pal, bg_index=3)
    frames = decode_gif_frames(data)
    assert frames.shape == (3, 5, 6, 3)
    exp1 = pal[f0].copy()
    exp1[2:4, 1:4] = pal[patch]
    assert (frames[1] == exp1).all()
    exp2 = pal[f0].copy()
    exp2[2:4, 1:4] = pal[3]          # disposal-2 restore
    exp2[0, 0] = pal[5]              # third frame's own 1x1 rect
    assert (frames[2] == exp2).all()

    # a GCE governs exactly ONE image: the transparency set for frame 2
    # must not leak into frame 3
    f1 = f0.copy()
    f1[:] = 7
    data = encode_gif_frames(
        [{"indices": f0}, {"indices": f1, "transparent": 7},
         {"indices": f1}], (6, 5), pal)
    frames = decode_gif_frames(data)
    assert (frames[1] == pal[f0]).all()       # fully transparent overlay
    assert (frames[2] == pal[f1]).all()       # GCE expired: opaque


def test_animation_error_paths():
    import pytest as _pytest

    from duckdb_hybrid_doc_search_spark.functions.gif import (
        decode_gif_frames, encode_gif_frames)

    pal = _pal16()
    f0 = _img(4, 3, lambda x, y: (x + y) % 16)
    with _pytest.raises(ValueError, match="overflows"):
        decode_gif_frames(encode_gif_frames(
            [{"indices": f0, "left": 2}], (4, 3), pal))
    good = encode_gif_frames([{"indices": f0}], (4, 3), pal)
    with _pytest.raises(ValueError, match="truncated"):
        decode_gif_frames(good[:-4])


def test_single_image_frames_equals_decode_gif():
    from duckdb_hybrid_doc_search_spark.functions.gif import (
        decode_gif_frames)

    pal = _pal16()
    idx = _img(5, 4, lambda x, y: (x * 3 + y * 5) % 16)
    data = encode_gif(idx, pal)
    frames = decode_gif_frames(data)
    assert frames.shape[0] == 1
    assert (frames[0] == decode_gif(data)).all()


def test_animation_disposal_restore_to_previous():
    """Disposal 3: after the frame shows, its rect reverts to the
    PRE-FRAME canvas content — the next frame composites over what was
    there before, not over the disposed frame's pixels."""
    from duckdb_hybrid_doc_search_spark.functions.gif import (
        decode_gif_frames, encode_gif_frames)

    pal = _pal16()
    base = _img(6, 5, lambda x, y: (x + y * 3) % 16)
    overlay = _img(3, 2, lambda x, y: (x * 5 + y + 1) % 16)
    tail = _img(2, 1, lambda x, y: (x + 9) % 16)
    data = encode_gif_frames(
        [{"indices": base},
         {"indices": overlay, "left": 2, "top": 1, "disposal": 3},
         {"indices": tail, "left": 0, "top": 4}],
        (6, 5), pal)
    frames = decode_gif_frames(data)
    assert frames.shape == (3, 5, 6, 3)
    exp1 = pal[base].copy()
    exp1[1:3, 2:5] = pal[overlay]
    assert (frames[1] == exp1).all()
    exp2 = pal[base].copy()          # overlay rect restored
    exp2[4, 0:2] = pal[tail]
    assert (frames[2] == exp2).all()

    # restore composes with transparency: the disposed frame's
    # transparent pixels never painted, the opaque ones revert too
    data = encode_gif_frames(
        [{"indices": base},
         {"indices": overlay, "left": 2, "top": 1, "disposal": 3,
          "transparent": 6},
         {"indices": tail, "left": 0, "top": 4}],
        (6, 5), pal)
    frames = decode_gif_frames(data)
    exp1 = pal[base].copy()
    rect = exp1[1:3, 2:5]
    exp1[1:3, 2:5] = np.where((overlay == 6)[:, :, None], rect,
                              pal[overlay])
    assert (frames[1] == exp1).all()
    assert (frames[2] == exp2).all()
