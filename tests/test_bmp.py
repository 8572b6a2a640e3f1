"""Pure-stdlib BMP codec (functions/bmp.py): round-trips over both bit
depths and orientations, spec compliance against an independently
hand-crafted worked example, layout-rule pins (padding / flip /
swizzle), error cases, and the fixture/formula contract behind the
``media_bmp_decode_stats`` oracle."""

from __future__ import annotations

import os
import struct

import numpy as np
import pytest

from duckdb_hybrid_doc_search_spark.functions.bmp import (decode_bmp,
                                                          encode_bmp)

_FIX_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "fixtures", "bmp")


@pytest.mark.parametrize("shape", [(1, 1, 3), (6, 5, 3), (3, 7, 3),
                                   (4, 4, 4), (2, 9, 4)])
@pytest.mark.parametrize("top_down", [False, True])
def test_roundtrip(shape, top_down):
    rng = np.random.default_rng(sum(shape) + top_down)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    assert (decode_bmp(encode_bmp(img, top_down=top_down)) == img).all()


def test_spec_worked_example():
    """Independently hand-crafted 2x2 24-bit BMP (the BMP spec's
    canonical worked example): bottom-up rows, BGR samples, 2-byte row
    padding — catches a consistent encoder+decoder double-error that
    round-trip tests cannot see."""
    pixels = bytes([0, 0, 255,  0, 255, 0,  0, 0,      # bottom row + pad
                    255, 0, 0,  255, 255, 255,  0, 0])  # top row + pad
    hdr = struct.pack("<2sIHHI", b"BM", 54 + len(pixels), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(pixels),
                       2835, 2835, 0, 0)
    img = decode_bmp(hdr + info + pixels)
    assert img.tolist() == [[[0, 0, 255], [255, 255, 255]],
                            [[255, 0, 0], [0, 255, 0]]]


def test_row_padding_is_skipped():
    # w=1, 24-bit: 3 payload bytes + 1 pad byte per row; poison the pad
    img = np.arange(2 * 1 * 3, dtype=np.uint8).reshape(2, 1, 3)
    data = bytearray(encode_bmp(img))
    stride = 4
    offset = 54
    data[offset + 3] = 0xEE        # pad byte of row 0
    data[offset + stride + 3] = 0xEE
    assert (decode_bmp(bytes(data)) == img).all()


def test_orientation_flag():
    img = np.zeros((2, 1, 3), dtype=np.uint8)
    img[0, 0] = [10, 20, 30]   # top pixel
    img[1, 0] = [40, 50, 60]
    up = encode_bmp(img, top_down=False)
    down = encode_bmp(img, top_down=True)
    (h_up,) = struct.unpack_from("<i", up, 14 + 8)
    (h_down,) = struct.unpack_from("<i", down, 14 + 8)
    assert h_up == 2 and h_down == -2
    assert (decode_bmp(up) == decode_bmp(down)).all()


def test_error_cases():
    with pytest.raises(ValueError, match="bad signature"):
        decode_bmp(b"NOPE" + b"\x00" * 64)
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    data = bytearray(encode_bmp(img))
    struct.pack_into("<I", data, 14 + 16, 1)  # compression = BI_RLE8
    with pytest.raises(ValueError, match="compression"):
        decode_bmp(bytes(data))
    data = bytearray(encode_bmp(img))
    struct.pack_into("<H", data, 14 + 14, 8)  # bpp = 8 (palette)
    with pytest.raises(ValueError, match="bit depth"):
        decode_bmp(bytes(data))
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(bytes(encode_bmp(img))[:-5])


def test_fixtures_match_generator_formulas():
    import sys

    sys.path.insert(0, os.path.dirname(_FIX_DIR.rstrip("/")).rsplit(
        "/fixtures", 1)[0])
    from tools.gen_bmp_fixtures import FIXTURES, build

    for name, w, h, top_down, chans in FIXTURES:
        with open(os.path.join(_FIX_DIR, f"{name}.bmp"), "rb") as f:
            img = decode_bmp(f.read())
        assert (img == build(w, h, chans)).all(), name


def test_bmp_pure_backend_through_image_operators(spark):
    """The decode seam generalizes: extract_image_features runs with
    decode_backend='bmp_pure' over the fixtures and reports the TRUE
    decoded dims in the feature tail (dims 30/31)."""
    from duckdb_hybrid_doc_search_spark.plans.multimodal_queries import (
        _BMP_DIR)
    from duckdb_hybrid_doc_search_spark.operators import multimodal as mm
    from pyspark.sql import functions as F

    files = spark.read.format("binaryFile").load(str(_BMP_DIR) + "/*.bmp")
    media = files.select(
        F.regexp_extract("path", "([^/]+)$", 1).alias("media_id"),
        F.col("content").alias("payload"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.lit("bmp").alias("codec"),
        ).alias("meta"),
    )
    feats = {r["media_id"]: r["feature"] for r in
             mm.extract_image_features(
                 media, decode_backend="bmp_pure").collect()}
    dims = {n: (f[30], f[31]) for n, f in feats.items()}
    assert dims == {"rgb_up.bmp": (5.0, 6.0), "rgb_down.bmp": (7.0, 4.0),
                    "rgba_up.bmp": (6.0, 3.0)}


def test_sniff_image_format():
    from duckdb_hybrid_doc_search_spark.operators.multimodal import (
        sniff_image_format)

    img = np.zeros((2, 2, 3), dtype=np.uint8)
    assert sniff_image_format(encode_bmp(img)) == "bmp"
    from duckdb_hybrid_doc_search_spark.functions.png import encode_png

    assert sniff_image_format(encode_png(img)) == "png"
    from duckdb_hybrid_doc_search_spark.functions.gif import encode_gif

    pal = np.zeros((2, 3), dtype=np.uint8)
    assert sniff_image_format(
        encode_gif(np.zeros((2, 2), dtype=np.uint8), pal)) == "gif"
    with pytest.raises(ValueError, match="unrecognized"):
        sniff_image_format(b"RIFFxxxxWAVE")


def test_malformed_header_fields_raise_loudly():
    """Untrusted header fields hit the documented ValueError contract
    instead of decoding header bytes as pixels (offset pointing inside
    the headers) or dying in an opaque numpy stride error (w <= 0)."""
    good = encode_bmp(np.zeros((2, 2, 3), dtype=np.uint8))
    # pixel-data offset (file-header bytes 10..13) rewritten to 20 —
    # inside the 54-byte header block
    bad_offset = good[:10] + struct.pack("<I", 20) + good[14:]
    with pytest.raises(ValueError, match="offset 20 inside headers"):
        decode_bmp(bad_offset)
    # width (info-header bytes 18..21) rewritten to 0 and to -3
    for w in (0, -3):
        bad_width = good[:18] + struct.pack("<i", w) + good[22:]
        with pytest.raises(ValueError, match="non-positive width"):
            decode_bmp(bad_width)


def test_split_bmp_container_roundtrip_and_errors():
    """The concatenated-BMP demux walks frames via the header's own
    file-size field, and fails loudly on a bad boundary or a declared
    size running past the buffer."""
    from duckdb_hybrid_doc_search_spark.functions.bmp import (
        split_bmp_container)

    rng = np.random.default_rng(7)
    frames = [rng.integers(0, 256, size=(3, 4, 3), dtype=np.uint8)
              for _ in range(4)]
    blob = b"".join(encode_bmp(f) for f in frames)
    back = split_bmp_container(blob)
    assert len(back) == 4
    for f, b in zip(frames, back):
        assert (decode_bmp(b) == f).all()
    with pytest.raises(ValueError, match="bad frame boundary"):
        split_bmp_container(blob + b"JUNK")
    with pytest.raises(ValueError, match="runs past the container"):
        split_bmp_container(blob[:-10])


def test_bmpv_fixture_frame_sampling(spark):
    """The real video path end-to-end on the committed containers:
    demux -> per-frame stdlib decode -> byte sums equal a direct
    recomputation from the fixture formulas (clip3 pins duplicate
    source frames when m < n_frames)."""
    from duckdb_hybrid_doc_search_spark.operators import multimodal as mm
    from duckdb_hybrid_doc_search_spark.plans.multimodal_queries import (
        _BMPV_DIR)
    from pyspark.sql import functions as F
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tools"))
    from gen_bmpv_fixtures import FIXTURES, build_frame

    files = spark.read.format("binaryFile").load(str(_BMPV_DIR) + "/*.bmpv")
    media = files.select(
        F.regexp_extract("path", "([^/]+)$", 1).alias("media_id"),
        F.lit("video").alias("kind"),
        F.col("content").alias("payload"),
        F.struct(F.lit(None).cast("int").alias("width"),
                 F.lit(None).cast("int").alias("height"),
                 F.lit(None).cast("int").alias("duration_ms"),
                 F.lit("bmpv").alias("codec")).alias("meta"),
    )
    got = {(r.media_id, r.frame_idx): (r.ts_ms, bytes(r.frame))
           for r in mm.sample_video_frames(
               media, n_frames=4, decode_backend="bmpv_pure").collect()}
    assert len(got) == 3 * 4
    for name, w, h, m, _td, _rgba, chans in FIXTURES:
        for k in range(4):
            src = k * m // 4
            img = build_frame(w, h, src, chans)[:, :, :3]
            ts, frame = got[(f"{name}.bmpv", k)]
            assert ts == src * 1000 // mm.VIDEO_FPS
            assert frame == img.tobytes()


def test_empty_container_raises():
    from duckdb_hybrid_doc_search_spark.functions.bmp import (
        split_bmp_container)

    with pytest.raises(ValueError, match="empty BMP container"):
        split_bmp_container(b"")
