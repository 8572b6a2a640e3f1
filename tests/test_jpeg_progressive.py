"""Progressive JPEG (SOF2, T.81 Annex G) — decoder + fixture encoder.

The load-bearing property: both encoders share one quantizer and
progressive entropy coding is LOSSLESS over the quantized coefficients,
so decode(progressive(img)) must equal decode(baseline(img)) BIT FOR
BIT at every quality, shape, subsampling, and restart interval. One
equality therefore pins the whole Annex-G surface — spectral selection,
successive approximation (DC + AC refinement correction bits), EOB run
coding, interleaved DC / non-interleaved AC MCU ordering — against the
independently-tested baseline path."""

from __future__ import annotations

import numpy as np
import pytest

from duckdb_hybrid_doc_search_spark.functions.jpeg import (
    decode_jpeg, encode_jpeg, encode_jpeg_progressive,
    encode_jpeg_progressive_ycbcr, encode_jpeg_ycbcr)


def _equal_decodes(img, quality, **kw):
    base = decode_jpeg(encode_jpeg(img, quality=quality, **kw))
    prog = decode_jpeg(encode_jpeg_progressive(img, quality=quality, **kw))
    assert prog.dtype == np.uint8
    return np.array_equal(base, prog)


@pytest.mark.parametrize("seed", [3, 17, 41])
@pytest.mark.parametrize("quality", [100, 90, 50])
def test_progressive_gray_equals_baseline(seed, quality):
    rng = np.random.default_rng(seed)
    h, w = int(rng.integers(1, 40)), int(rng.integers(1, 40))
    img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    assert _equal_decodes(img, quality)


@pytest.mark.parametrize("seed", [5, 23])
@pytest.mark.parametrize("subsampling", ["444", "422", "420"])
@pytest.mark.parametrize("quality", [100, 75])
def test_progressive_color_equals_baseline(seed, subsampling, quality):
    """Random color content at q75-100 drives every Annex-G path hard:
    dense AC coefficients make the refinement scans carry long
    correction-bit runs, ZRL folding, and multi-block EOB runs."""
    rng = np.random.default_rng(seed)
    h, w = int(rng.integers(9, 36)), int(rng.integers(9, 36))
    img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    assert _equal_decodes(img, quality, subsampling=subsampling)


@pytest.mark.parametrize("restart_interval", [1, 2, 5])
def test_progressive_restart_markers_equal_baseline(restart_interval):
    """RSTn inside progressive scans resets DC predictors AND the EOB
    run + refinement bit state — per scan, per interval."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(32, 48, 3), dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(img, quality=80, subsampling="420"))
    prog = decode_jpeg(encode_jpeg_progressive(
        img, quality=80, subsampling="420",
        restart_interval=restart_interval))
    assert np.array_equal(base, prog)


def test_progressive_blockwise_constant_q100_is_exact():
    """The oracle regime carries over: q100 blockwise-constant planes
    decode bit-exactly through the progressive path too (DC-only
    blocks; the AC scans degenerate to pure EOB runs — which must still
    parse correctly across blocks)."""
    rng = np.random.default_rng(7)
    blocks = rng.integers(0, 256, size=(3, 4))
    img = np.repeat(np.repeat(blocks, 8, 0), 8, 1)[:21, :27].astype(np.uint8)
    dec = decode_jpeg(encode_jpeg_progressive(img, quality=100))
    assert np.array_equal(dec[:, :, 0], img)


def test_progressive_ycbcr_fixture_path_is_exact():
    """encode_jpeg_progressive_ycbcr mirrors encode_jpeg_ycbcr's
    fixture contract: q100 tile-constant YCbCr planes round-trip to the
    exact JFIF conversion — the property media_jpeg_progressive_stats'
    oracle relies on."""
    h = w = 32
    f = lambda a, b, c, t: np.array(  # noqa: E731
        [[((x // t) * a + (y // t) * b + c) % 256 for x in range(w)]
         for y in range(h)], dtype=np.int64)
    y, cb, cr = f(19, 9, 35, 8), f(21, 13, 80, 16), f(7, 23, 55, 16)
    prog = decode_jpeg(encode_jpeg_progressive_ycbcr(
        y, cb, cr, quality=100, subsampling="420"))
    base = decode_jpeg(encode_jpeg_ycbcr(
        y, cb, cr, quality=100, subsampling="420"))
    assert np.array_equal(prog, base)


def test_long_eob_runs_across_blocks():
    """A nearly-flat image with one busy block: the AC first scans code
    a long EOBn run before and after the lone non-EOB block, and the
    refinement scans ride correction bits on the run — the
    cross-block EOB state machine."""
    img = np.full((64, 64), 128, dtype=np.uint8)
    img[24:32, 24:32] = np.arange(64, dtype=np.uint8).reshape(8, 8) * 4
    assert _equal_decodes(img, 90)


def test_sparse_high_frequency_exercises_zrl_in_refinement():
    """Isolated high-frequency coefficients separated by >16 zeros force
    ZRL emission inside refinement scans (the r>15 fold rule against
    the last newly-nonzero position)."""
    rng = np.random.default_rng(13)
    img = np.full((16, 16), 100, dtype=np.uint8)
    img[::7, ::7] = 250  # sparse spikes -> isolated AC energy
    assert _equal_decodes(img, 95)


def test_invalid_progressive_scan_headers_raise():
    """A baseline stream with its SOF marker flipped to SOF2 carries a
    scan header (Ss=0, Se=63) no progressive stream may have — the
    decoder must reject it as corrupt, not decode garbage."""
    img = np.zeros((8, 8), dtype=np.uint8)
    data = bytearray(encode_jpeg(img, quality=90))
    i = data.find(b"\xFF\xC0")
    data[i + 1] = 0xC2
    with pytest.raises(ValueError, match="DC and AC"):
        decode_jpeg(bytes(data))


def test_interleaved_ac_scan_raises():
    """AC progressive scans must be single-component (G.1.1.1.1):
    an interleaved AC scan header is corrupt data."""
    img = np.zeros((8, 8, 3), dtype=np.uint8)
    data = bytearray(encode_jpeg_progressive(img, quality=90))
    # find the luma AC scan SOS (second SOS) and splice a 3-comp header
    first = data.find(b"\xFF\xDA")
    second = data.find(b"\xFF\xDA", first + 2)
    assert second > 0
    bad_sos = b"\xFF\xDA\x00\x0C\x03\x01\x00\x02\x00\x03\x00\x01\x3F\x01"
    spliced = bytes(data[:second]) + bad_sos + bytes(
        data[second + 10:])  # original 1-comp SOS is 10 bytes long
    with pytest.raises(ValueError, match="non-interleaved"):
        decode_jpeg(spliced)


def test_arithmetic_sof_still_raises_not_implemented():
    """The documented tail after SOF2 landed: arithmetic-coded (SOF9)
    streams still raise loudly."""
    img = np.zeros((8, 8), dtype=np.uint8)
    data = bytearray(encode_jpeg(img, quality=90))
    i = data.find(b"\xFF\xC0")
    data[i + 1] = 0xC9
    with pytest.raises(NotImplementedError, match="SOF9"):
        decode_jpeg(bytes(data))


def test_truncated_progressive_entropy_raises():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(16, 16), dtype=np.uint8)
    data = encode_jpeg_progressive(img, quality=90)
    with pytest.raises(ValueError, match="truncated|ran out|marker"):
        decode_jpeg(data[:len(data) - 12])


def test_deterministic_progressive_encoder():
    rng = np.random.default_rng(19)
    img = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
    assert (encode_jpeg_progressive(img, quality=85)
            == encode_jpeg_progressive(img, quality=85))
