"""Pure-stdlib baseline JPEG codec (functions/jpeg.py) + the
media_jpeg_decode_stats chain: block formula -> encoder -> bytes ->
decoder -> exact channel sums (the q100 blockwise-constant regime), plus
the lossy-path tolerance bounds and the loud unsupported-mode tail."""

from __future__ import annotations

import math
import os

import numpy as np
import pytest

from duckdb_hybrid_doc_search_spark.functions.jpeg import (
    decode_jpeg, encode_jpeg, encode_jpeg_ycbcr, quality_tables)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
JPEG_DIR = os.path.join(REPO, "fixtures", "jpeg")


def _plane(w, h, f):
    return np.array([[f(x, y) for x in range(w)] for y in range(h)],
                    dtype=np.int64)


def _jfif_rgb(yv, cbv, crv):
    clip = lambda v: min(255, max(0, v))  # noqa: E731
    return (
        clip(math.floor(yv + 1.402 * (crv - 128) + 0.5)),
        clip(math.floor(yv - 0.344136 * (cbv - 128)
                        - 0.714136 * (crv - 128) + 0.5)),
        clip(math.floor(yv + 1.772 * (cbv - 128) + 0.5)),
    )


def test_quality_tables_q100_all_ones():
    ql, qc = quality_tables(100)
    assert (ql == 1).all() and (qc == 1).all()
    ql50, _ = quality_tables(50)
    assert ql50[0] == 16  # scale 100% -> the Annex-K base table
    ql1, _ = quality_tables(1)
    assert ql1.max() == 255  # clamped


@pytest.mark.parametrize("shape", [(16, 24), (13, 21), (8, 8), (1, 1),
                                   (9, 30)])
def test_gray_blockwise_constant_roundtrip_is_exact(shape):
    h, w = shape
    img = _plane(w, h, lambda x, y: ((x // 8) * 17 + (y // 8) * 29 + 3)
                 % 256).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=100))
    assert dec.shape == (h, w, 1)
    assert np.array_equal(dec[:, :, 0], img)


@pytest.mark.parametrize("subsampling,tile", [("444", 8), ("422", 8),
                                              ("420", 16)])
def test_ycbcr_blockwise_constant_matches_jfif_formula(subsampling, tile):
    """With q100 and chroma constant per subsampling tile, decoded
    YCbCr is bit-exact, so decoded RGB is the verbatim floor(x+0.5)
    JFIF conversion — the property the SQL oracles rely on."""
    w = h = 32
    y = _plane(w, h, lambda x, yy: ((x // 8) * 13 + (yy // 8) * 7 + 40)
               % 256)
    cb = _plane(w, h, lambda x, yy:
                ((x // tile) * 5 + (yy // tile) * 3 + 90) % 256)
    cr = _plane(w, h, lambda x, yy:
                ((x // tile) * 2 + (yy // tile) * 11 + 60) % 256)
    dec = decode_jpeg(encode_jpeg_ycbcr(y, cb, cr, quality=100,
                                        subsampling=subsampling))
    want = np.array([[_jfif_rgb(y[j, i], cb[j, i], cr[j, i])
                      for i in range(w)] for j in range(h)])
    assert np.array_equal(dec, want)


def test_restart_markers_do_not_change_the_result():
    w = h = 32
    y = _plane(w, h, lambda x, yy: ((x // 8) * 19 + (yy // 8) * 9 + 35)
               % 256)
    cb = _plane(w, h, lambda x, yy: ((x // 16) * 21 + (yy // 16) * 13
                                     + 80) % 256)
    cr = _plane(w, h, lambda x, yy: ((x // 16) * 7 + (yy // 16) * 23
                                     + 55) % 256)
    plain = decode_jpeg(encode_jpeg_ycbcr(y, cb, cr, 100, "420"))
    rst = encode_jpeg_ycbcr(y, cb, cr, 100, "420", restart_interval=1)
    assert b"\xFF\xD0" in rst  # RST0 actually emitted
    assert np.array_equal(decode_jpeg(rst), plain)


@pytest.mark.parametrize("quality,bound", [(95, 4), (90, 6), (75, 16)])
def test_lossy_gradient_error_is_bounded(quality, bound):
    """The genuinely lossy path: a smooth gradient's reconstruction
    error shrinks with quality — measured bounds, not hopes."""
    img = (np.add.outer(np.arange(24) * 5, np.arange(32) * 3)
           % 256).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=quality))[:, :, 0]
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= bound, (quality, err.max())


def test_rgb_roundtrip_within_color_conversion_rounding():
    """RGB in, RGB out at q100 with constant blocks: the only loss is
    the RGB->YCbCr->RGB integer rounding, bounded at +-2 per channel."""
    bx, by = np.arange(3), np.arange(2)
    r = np.repeat(np.repeat((np.add.outer(by * 7, bx * 13) + 40) % 256,
                            8, 0), 8, 1)
    rgb = np.stack([r, (r * 2) % 256, (r * 3) % 256],
                   axis=2).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(rgb, quality=100))
    assert np.abs(dec.astype(int) - rgb.astype(int)).max() <= 2


def test_committed_fixtures_decode_to_their_formulas():
    """The oracle contract on the COMMITTED bytes (not a fresh
    encode): gray.jpg / ycc444.jpg / ycc420.jpg decode to exactly the
    block formulas tools/gen_jpeg_fixtures.py documents."""
    with open(os.path.join(JPEG_DIR, "gray.jpg"), "rb") as f:
        dec = decode_jpeg(f.read())
    want = _plane(21, 13, lambda x, y: ((x // 8) * 17 + (y // 8) * 29
                                        + 3) % 256)
    assert np.array_equal(dec[:, :, 0], want)

    with open(os.path.join(JPEG_DIR, "ycc444.jpg"), "rb") as f:
        dec = decode_jpeg(f.read())
    y = _plane(24, 16, lambda x, yy: ((x // 8) * 13 + (yy // 8) * 7
                                      + 40) % 256)
    cb = _plane(24, 16, lambda x, yy: ((x // 8) * 5 + (yy // 8) * 3
                                       + 90) % 256)
    cr = _plane(24, 16, lambda x, yy: ((x // 8) * 2 + (yy // 8) * 11
                                       + 60) % 256)
    want = np.array([[_jfif_rgb(y[j, i], cb[j, i], cr[j, i])
                      for i in range(24)] for j in range(16)])
    assert np.array_equal(dec, want)

    with open(os.path.join(JPEG_DIR, "ycc420.jpg"), "rb") as f:
        data = f.read()
    assert b"\xFF\xD0" in data  # the RSTn fixture really has restarts
    dec = decode_jpeg(data)
    y = _plane(32, 32, lambda x, yy: ((x // 8) * 19 + (yy // 8) * 9
                                      + 35) % 256)
    cb = _plane(32, 32, lambda x, yy: ((x // 16) * 21 + (yy // 16) * 13
                                       + 80) % 256)
    cr = _plane(32, 32, lambda x, yy: ((x // 16) * 7 + (yy // 16) * 23
                                       + 55) % 256)
    want = np.array([[_jfif_rgb(y[j, i], cb[j, i], cr[j, i])
                      for i in range(32)] for j in range(32)])
    assert np.array_equal(dec, want)


def test_sniff_dispatch_recognizes_jpeg():
    from duckdb_hybrid_doc_search_spark.operators.multimodal import (
        sniff_image_format)

    with open(os.path.join(JPEG_DIR, "gray.jpg"), "rb") as f:
        assert sniff_image_format(f.read()) == "jpeg"


def test_bad_signature_raises():
    with pytest.raises(ValueError, match="bad SOI"):
        decode_jpeg(b"\x89PNG\r\n\x1a\nnot a jpeg")


def test_lossless_sof_raises_not_implemented():
    """Swap SOF0 (FFC0) for SOF3 (lossless) in a valid stream: the
    documented loud tail, not silent garbage. (SOF2 progressive is
    REAL since r13 — tests/test_jpeg_progressive.py.)"""
    img = np.zeros((8, 8), dtype=np.uint8)
    data = bytearray(encode_jpeg(img, quality=90))
    i = data.find(b"\xFF\xC0")
    assert i > 0
    data[i + 1] = 0xC3
    with pytest.raises(NotImplementedError, match="SOF3"):
        decode_jpeg(bytes(data))


def test_truncated_entropy_raises():
    img = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 3) % 256
    data = encode_jpeg(img.astype(np.uint8), quality=90)
    with pytest.raises(ValueError, match="truncated|ran out"):
        decode_jpeg(data[:len(data) - 10])


def test_unknown_subsampling_raises():
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    with pytest.raises(ValueError, match="subsampling"):
        encode_jpeg(img, subsampling="411")


def test_permissive_path_handles_jpeg(spark, tmp_path):
    """The quarantine ingest (decode_stats_permissive) routes sniffed
    JPEG payloads to the JPEG codec (the r9 gif-fell-through-to-bmp
    finding, re-applied at r12): healthy baseline AND progressive
    fixtures are 'ok' rows with exact pixel facts (SOF2 decode is real
    since r13), a stream whose SOF marker lies about its scan script is
    'corrupt' (ValueError captured as data), junk stays
    'unrecognized'."""
    from duckdb_hybrid_doc_search_spark.functions.jpeg import (
        encode_jpeg_progressive)
    from duckdb_hybrid_doc_search_spark.operators.multimodal import (
        decode_stats_permissive)

    d = tmp_path / "dirty"
    d.mkdir()
    img = np.full((8, 8), 9, dtype=np.uint8)
    good = encode_jpeg(img, quality=100)
    (d / "ok.jpg").write_bytes(good)
    (d / "prog_ok.jpg").write_bytes(
        encode_jpeg_progressive(img, quality=100))
    bad = bytearray(good)
    i = bad.find(b"\xFF\xC0")
    bad[i + 1] = 0xC2  # SOF2 over a baseline scan script: corrupt
    (d / "bad.jpg").write_bytes(bytes(bad))
    (d / "junk.dat").write_bytes(b"JUNKJUNKJUNK")
    rows = {r["file_name"]: tuple(r)[1:] for r in
            decode_stats_permissive(spark, [str(d)]).collect()}
    assert rows["ok.jpg"] == ("jpeg", "ok", 8, 8, 1, 9 * 64)
    assert rows["prog_ok.jpg"] == ("jpeg", "ok", 8, 8, 1, 9 * 64)
    assert rows["bad.jpg"][:2] == ("jpeg", "corrupt")
    assert rows["junk.dat"] == ("unknown", "unrecognized", 0, 0, 0, 0)


def test_gray_decode_returns_uint8():
    """The decoded-array contract is uint8 like every sibling codec —
    int64 would 8x-inflate downstream .tobytes() payloads (r12 review
    finding, fixed)."""
    img = np.full((8, 8), 7, dtype=np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=100))
    assert dec.dtype == np.uint8


def test_quantization_order_roundtrip_at_q50():
    """r12 review finding (fixed): the encoder quantized ZIGZAG-ordered
    coefficients with the NATURAL-order table, mis-scaling every AC
    coefficient at quality<100 (max round-trip error 38 on this stripe
    image; 4 with the ordering fixed). Pin the fixed bound."""
    img = np.zeros((8, 8), dtype=np.uint8)
    img[:, ::2] = 200  # vertical stripes: strong high-frequency AC
    dec = decode_jpeg(encode_jpeg(img, quality=50))[:, :, 0]
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= 6, err.max()


def test_fill_bytes_and_tem_marker_are_skipped():
    """B.1.1.2/B.1.1.3: markers may be preceded by 0xFF fill bytes, and
    TEM (0xFF01) / RSTn are standalone (no length field). A spec-legal
    stream carrying both must decode identically, not quarantine as
    corrupt (r12 ADVICE)."""
    img = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 3) % 256
    data = encode_jpeg(img.astype(np.uint8), quality=100)
    i = data.find(b"\xFF\xDB")  # before the first DQT
    assert i > 0
    padded = data[:i] + b"\xFF\x01" + b"\xFF\xFF\xFF" + data[i + 1:]
    assert np.array_equal(decode_jpeg(padded), decode_jpeg(data))


def test_extreme_checkerboard_ac_is_clamped_not_keyerror():
    """A full-amplitude checkerboard at quality=100 quantizes its
    highest-frequency AC coefficient to magnitude 1024 (category 11),
    which the Annex-K AC tables (sizes 1..10) cannot code — the encoder
    must clamp to ±1023 (baseline's AC cap), not KeyError (r12 ADVICE).
    The one-step clamp keeps the round-trip error tiny."""
    yy, xx = np.mgrid[0:16, 0:16]
    img = (255 * ((xx + yy) % 2)).astype(np.uint8)
    dec = decode_jpeg(encode_jpeg(img, quality=100))[:, :, 0]
    err = np.abs(dec.astype(int) - img.astype(int))
    assert err.max() <= 2, err.max()


def test_non_interleaved_scan_raises_not_implemented():
    """A spec-valid baseline stream MAY carry one component per scan;
    this decoder supports the interleaved single-scan form and must
    fail LOUDLY on the rest (r12 review: was a bare KeyError mid-MCU)."""
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    data = bytearray(encode_jpeg(img, quality=90))
    i = data.find(b"\xFF\xDA")
    assert i > 0
    # replace the 3-component SOS (len 12: ns=3 + 3 pairs + 3 trailer)
    # with a 1-component one (len 8: ns=1 + 1 pair + 3 trailer)
    new_sos = b"\xFF\xDA\x00\x08\x01\x01\x00\x00\x3F\x00"
    spliced = bytes(data[:i]) + new_sos + bytes(data[i + 14:])
    with pytest.raises(NotImplementedError, match="non-interleaved"):
        decode_jpeg(spliced)
