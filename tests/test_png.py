"""Pure-stdlib PNG codec (functions/png.py) + the media_png_decode_stats
chain: formula -> encoder -> bytes -> decoder -> exact channel sums."""

from __future__ import annotations

import os
import struct
import zlib

import numpy as np
import pytest

from duckdb_hybrid_doc_search_spark.functions.png import (decode_png,
                                                          encode_png)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PNG_DIR = os.path.join(REPO, "fixtures", "png")


@pytest.mark.parametrize("shape", [(12, 16, 3), (7, 9, 1), (5, 8, 4),
                                   (1, 1, 3), (30, 2, 3), (2, 40, 4)])
@pytest.mark.parametrize("mode", ["mixed", "none"])
def test_roundtrip(shape, mode):
    rng = np.random.default_rng(hash(shape) % (2**32))
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    back = decode_png(encode_png(img, mode))
    assert back.shape == img.shape
    assert (back == img).all()


def test_mixed_mode_exercises_all_five_filters():
    """The fixture contract: with >=5 scanlines, 'mixed' writes every
    filter type 0..4 — so decode of the fixtures covers every
    reconstruction branch."""
    img = np.arange(7 * 4 * 3, dtype=np.uint8).reshape(7, 4, 3)
    data = encode_png(img, "mixed")
    # IDAT payload starts after signature + IHDR chunk (8 + 25 bytes);
    # parse chunks properly instead of assuming offsets
    pos, idat = 8, b""
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        if data[pos + 4:pos + 8] == b"IDAT":
            idat += data[pos + 8:pos + 8 + length]
        pos += 12 + length
    raw = zlib.decompress(idat)
    stride = 4 * 3
    filters = [raw[y * (stride + 1)] for y in range(7)]
    assert filters == [0, 1, 2, 3, 4, 0, 1]
    assert (decode_png(data) == img).all()


def test_error_cases():
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"GIF89a not a png")
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    data = encode_png(img)
    with pytest.raises(ValueError):
        decode_png(data[:20])  # truncated: no IDAT
    with pytest.raises(ValueError, match="channel count"):
        encode_png(np.zeros((2, 2, 2), dtype=np.uint8))


def test_decodes_externally_created_png():
    """Spec-compliance beyond self-roundtrip: decode a PNG written by a
    REAL encoder (libpng via the OS / doc toolchains), not by this
    module. Skipped when no system PNG of a supported shape exists."""
    candidates = [
        "/usr/share/doc/python3/_static/file.png",
        "/usr/share/gitweb/static/git-favicon.png",
    ]
    for path in candidates:
        if not os.path.exists(path):
            continue
        data = open(path, "rb").read()
        w, h, depth, color, _, _, inter = struct.unpack(
            ">IIBBBBB", data[16:29]
        )
        if depth != 8 or color not in (0, 2, 6) or inter != 0:
            continue
        img = decode_png(data)
        assert img.shape == (h, w, {0: 1, 2: 3, 6: 4}[color])
        assert img.dtype == np.uint8
        return
    pytest.skip("no supported externally-created PNG on this system")


def test_fixtures_match_generator_formulas():
    """The committed fixtures decode to EXACTLY the generator formulas
    (tools/gen_png_fixtures.py) — the same invariant the registered
    query's DuckDB oracle checks via generate_series."""
    from tools.gen_png_fixtures import FIXTURES, build

    for name, w, h, chans in FIXTURES:
        data = open(os.path.join(PNG_DIR, f"{name}.png"), "rb").read()
        img = decode_png(data)
        assert img.shape == (h, w, len(chans))
        assert (img == build(name, w, h, chans)).all(), name


def test_png_decode_stats_operator(spark):
    from duckdb_hybrid_doc_search_spark.operators.multimodal import (
        png_decode_stats)

    rows = {r.file_name: r for r in png_decode_stats(spark, PNG_DIR).collect()}
    assert set(rows) == {"rgb.png", "gray.png", "rgba.png"}
    r = rows["rgb.png"]
    assert (r.width, r.height, r.channels) == (16, 12, 3)
    assert (r.sum_c0, r.sum_c1, r.sum_c2, r.sum_c3) == (
        23808, 15552, 29920, 0
    )
    g = rows["gray.png"]
    assert (g.width, g.height, g.channels, g.sum_c0) == (9, 7, 1, 8418)
    a = rows["rgba.png"]
    assert (a.sum_c0, a.sum_c1, a.sum_c2, a.sum_c3) == (940, 1140, 3060,
                                                        6920)


def test_png_pure_backend_through_image_operators(spark):
    """decode_backend='png_pure' drives the SAME mapInPandas operators as
    the fake backend — real PNG bytes in, pooled features / resized
    pixels out (gray replicates to RGB, RGBA drops alpha)."""
    from duckdb_hybrid_doc_search_spark.operators.multimodal import (
        attach_media_ids, extract_image_features, resize_images)

    payloads = [open(os.path.join(PNG_DIR, f), "rb").read()
                for f in ("rgb.png", "gray.png", "rgba.png")]
    media = attach_media_ids(spark.createDataFrame(
        [(p, {"width": None, "height": None, "duration_ms": None,
              "codec": "png"}) for p in payloads],
        "payload binary, meta struct<width:int,height:int,"
        "duration_ms:int,codec:string>",
    ))
    feats = extract_image_features(media, decode_backend="png_pure").collect()
    assert len(feats) == 3
    assert all(len(r.feature) == 32 for r in feats)
    # rgb.png features end with its TRUE decoded dims, not metadata's
    rgb_id = [r.media_id for r in media.collect()
              if bytes(r.payload) == payloads[0]][0]
    rgb_feat = [r.feature for r in feats if r.media_id == rgb_id][0]
    assert (rgb_feat[30], rgb_feat[31]) == (16.0, 12.0)

    resized = resize_images(media, 4, 4, decode_backend="png_pure").collect()
    assert len(resized) == 3
    assert all(len(bytes(r.resized)) == 4 * 4 * 3 for r in resized)
