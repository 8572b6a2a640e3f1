"""Hostile-bytes sweep for the JPEG decoder: a 100 TB permissive ingest
WILL hit bit-rotted and truncated streams, and the quarantine contract
(operators/multimodal.decode_stats_permissive) wants exactly one
corrupt-data exception surface — decode must either succeed (a flip in
entropy data or an ignored APPn segment can be survivable) or raise
ValueError / NotImplementedError. A raw KeyError/IndexError escaping
mid-MCU is a bug (r13: decode_jpeg translates internal faults)."""

from __future__ import annotations

import numpy as np
import pytest

from duckdb_hybrid_doc_search_spark.functions.jpeg import (
    decode_jpeg, encode_jpeg, encode_jpeg_progressive)


def _streams():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(24, 21, 3), dtype=np.uint8)
    gray = rng.integers(0, 256, size=(13, 17), dtype=np.uint8)
    return [
        encode_jpeg(img, quality=85, subsampling="420",
                    restart_interval=2),
        encode_jpeg(gray, quality=100),
        encode_jpeg_progressive(img, quality=85, subsampling="422"),
        encode_jpeg_progressive(gray, quality=90),
    ]


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_random_byte_flips_never_escape_the_error_contract(seed):
    rng = np.random.default_rng(seed)
    survived = failed = 0
    for data in _streams():
        for _ in range(60):
            buf = bytearray(data)
            for _ in range(int(rng.integers(1, 4))):
                buf[int(rng.integers(2, len(buf)))] = int(
                    rng.integers(0, 256))
            try:
                out = decode_jpeg(bytes(buf))
                assert out.dtype == np.uint8 and out.ndim == 3
                survived += 1
            except (ValueError, NotImplementedError):
                failed += 1
    # both outcomes must actually occur, or the sweep proves nothing
    assert survived > 0 and failed > 0, (survived, failed)


def test_truncations_never_escape_the_error_contract():
    for data in _streams():
        for cut in range(2, len(data), max(1, len(data) // 60)):
            try:
                decode_jpeg(data[:cut])
            except (ValueError, NotImplementedError):
                pass


def test_garbage_headers_raise_value_error():
    rng = np.random.default_rng(11)
    for n in (2, 3, 8, 64, 300):
        junk = b"\xFF\xD8" + bytes(rng.integers(0, 256, size=n).tolist())
        try:
            decode_jpeg(junk)
        except (ValueError, NotImplementedError):
            pass
