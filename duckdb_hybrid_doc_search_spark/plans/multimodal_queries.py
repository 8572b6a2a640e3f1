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
