"""Multimodal query registrations: metadata analytics oracle-gated; the
decode-path operators (features, resize, frame sampling) are rows-only —
their per-item math happens in Python batches and their correctness is
unit-tested (tests/test_multimodal.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..index.catalog import load_table
from ..operators import multimodal as mm
from .registry import register


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mm.synthesize_media(spark, load_table(spark, sf_dir, "documents"))


@register(
    "media_stats",
    oracle="""
SELECT kind, count(*)::BIGINT AS n,
       sum(octet_length(encode(text)))::BIGINT AS total_bytes,
       avg((n_chars % 64 + 8)::INT) AS avg_width,
       avg((n_chars * 10)::INT) AS avg_duration_ms
FROM (
  SELECT CASE (doc_id % 3) WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
         ELSE 'video' END AS kind, text, n_chars, doc_id
  FROM documents
)
GROUP BY kind ORDER BY kind
""".strip(),
)
def media_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mm.media_stats(_media(spark, sf_dir))


_PNG_DIR = __import__("pathlib").Path(__file__).resolve(
).parent.parent.parent / "fixtures" / "png"

# The oracle recomputes each fixture's per-channel pixel sums from the
# SAME closed-form (x, y) formulas tools/gen_png_fixtures.py rendered —
# generate_series is inclusive, so (0, w-1)x(0, h-1) spans the image.
# Fully independent of the PNG codec under test: a decoder (or encoder)
# bug breaks the hash match.
_PNG_ORACLE = """
WITH rgb AS (
  SELECT 'rgb.png' AS file_name, 16 AS width, 12 AS height, 3 AS channels,
         sum((x * 7 + y * 13) % 256)::BIGINT AS sum_c0,
         sum((x * 3 + y * 5 + 31) % 256)::BIGINT AS sum_c1,
         sum((x * 11 + y * 2 + 101) % 256)::BIGINT AS sum_c2,
         0::BIGINT AS sum_c3
  FROM generate_series(0, 15) t(x) CROSS JOIN generate_series(0, 11) s(y)
),
gray AS (
  SELECT 'gray.png' AS file_name, 9 AS width, 7 AS height, 1 AS channels,
         sum((x * 17 + y * 29 + 3) % 256)::BIGINT AS sum_c0,
         0::BIGINT AS sum_c1, 0::BIGINT AS sum_c2, 0::BIGINT AS sum_c3
  FROM generate_series(0, 8) t(x) CROSS JOIN generate_series(0, 6) s(y)
),
rgba AS (
  SELECT 'rgba.png' AS file_name, 8 AS width, 5 AS height, 4 AS channels,
         sum((x * 5 + y * 3) % 256)::BIGINT AS sum_c0,
         sum((x + y * 7 + 11) % 256)::BIGINT AS sum_c1,
         sum((x * 13 + y + 29) % 256)::BIGINT AS sum_c2,
         sum((x * 2 + y * 19 + 128) % 256)::BIGINT AS sum_c3
  FROM generate_series(0, 7) t(x) CROSS JOIN generate_series(0, 4) s(y)
)
SELECT * FROM rgb UNION ALL SELECT * FROM gray UNION ALL
SELECT * FROM rgba ORDER BY file_name
""".strip()


@register("media_png_decode_stats", oracle=_PNG_ORACLE)
def media_png_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First media row that exercises REAL bytes->pixels decode: stdlib
    PNG codec (functions/png.py) over the checked-in fixtures, channel
    sums pinned against a formula-derived oracle (the fixtures' pixels
    are closed-form in (x, y); see tools/gen_png_fixtures.py)."""
    return mm.png_decode_stats(spark, str(_PNG_DIR))


@register("media_image_features", oracle=None)
def media_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The feature vector is exploded to (media_id, dim_idx, value) scalar
    # rows: the driver's canonicalizer hashes values with pandas factorize,
    # which cannot hash an array<float> cell (r01's one red row).
    m = _media(spark, sf_dir)
    feats = mm.extract_image_features(m.where(m.kind == "image"))
    return feats.select(
        "media_id", F.posexplode("feature").alias("dim_idx", "value")
    ).withColumn("value", F.round(F.col("value").cast("double"), 4))


@register("media_resize_images", oracle=None)
def media_resize_images(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = _media(spark, sf_dir)
    return mm.resize_images(m.where(m.kind == "image"), 16, 16)


@register("media_video_frames", oracle=None)
def media_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = _media(spark, sf_dir)
    return mm.sample_video_frames(m.where(m.kind == "video"), n_frames=4)


@register("media_audio_windows", oracle=None, bench=True)
def media_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed audio framing over the synthesized media table (rows-only:
    the fake PCM decode is not SQL-expressible; framing invariants are
    unit-tested in tests/test_multimodal.py)."""
    from ..index.catalog import load_table
    from ..operators.multimodal import audio_window_features, synthesize_media

    docs = load_table(spark, sf_dir, "documents")
    return audio_window_features(synthesize_media(spark, docs))
