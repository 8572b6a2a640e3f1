"""Training-corpus curation operators — the end-to-end "make the training
set" surface that composes the dedup/quality/language building blocks
(project north-star; complements operators/dedup.py and textstats.py).

Everything is deterministic and hash-based so each stage has an exact
DuckDB oracle:

- stratified sampling: per-language rates via the md5-derived 60-bit hash
  (functions/hashing.py) — reproducible across engines AND across runs,
  unlike rand()-based sampling; at 100 TB this is a stateless map (no
  shuffle) whose selectivity is exactly the configured rate in expectation.
- curation pipeline: quality floor -> exact-dup keep-one -> near-dup
  drop-partner -> per-language stratified cap, emitting one row per KEPT
  document with the scores that justified keeping it. Each stage is a
  filter/semi/anti join on narrow key columns; nothing rescans text twice
  (the token pass is shared via the quality/minhash subtrees).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import dd_h64, h64
from . import dedup, textstats

SAMPLE_MOD = 10_000
# per-language per-10k keep thresholds: en kept sparser than the rest
# (downsample the majority language — the standard corpus-balancing move)
SAMPLE_RATES = {"en": 4000, "de": 8000, "fr": 8000, "es": 8000, "zh": 8000}
DEFAULT_RATE = 6000
QUALITY_FLOOR = 0.5


def _bucket(doc_id_col) -> F.Column:
    """Deterministic [0, SAMPLE_MOD) bucket from the doc id."""
    return F.pmod(h64(F.concat(F.lit("sample#"), doc_id_col.cast("string"))),
                  F.lit(SAMPLE_MOD))


def stratified_sample(docs: DataFrame) -> DataFrame:
    """Deterministic per-language sampling: keep doc when its hash bucket
    falls under the language's threshold. Output: doc_id, lang, bucket."""
    rate = F.lit(DEFAULT_RATE)
    for lang, r in SAMPLE_RATES.items():
        rate = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate)
    b = _bucket(F.col("doc_id"))
    return (
        docs.select("doc_id", "lang", b.alias("bucket"), rate.alias("rate"))
        .where(F.col("bucket") < F.col("rate"))
        .select("doc_id", "lang", "bucket")
    )


def dd_stratified_sample_sql(table: str = "documents") -> str:
    bucket = dd_h64("'sample#' || doc_id::VARCHAR")
    cases = " ".join(
        f"WHEN lang = '{la}' THEN {r}" for la, r in SAMPLE_RATES.items()
    )
    return f"""
SELECT doc_id, lang, ({bucket} % {SAMPLE_MOD}) AS bucket
FROM {table}
WHERE ({bucket} % {SAMPLE_MOD}) < (CASE {cases} ELSE {DEFAULT_RATE} END)
""".strip()


def curation_pipeline(docs: DataFrame) -> DataFrame:
    """The composed keep-set: quality floor, exact-dup keep-one, near-dup
    drop-higher-id-partner, then the stratified language cap. Output one
    row per kept doc: doc_id, lang, quality, bucket."""
    quality = textstats.quality_scores(docs).where(
        F.col("quality") >= QUALITY_FLOOR
    ).select("doc_id", "quality")
    exact_keep = dedup.dedup_exact(docs).select(
        F.col("keep_id").alias("doc_id")
    )
    near_drop = dedup.dedup_minhash_lsh(docs).select(
        F.col("doc_b").alias("doc_id")
    ).distinct()
    sampled = stratified_sample(docs)
    return (
        sampled.join(quality, "doc_id")
        .join(exact_keep, "doc_id", "left_semi")
        .join(near_drop, "doc_id", "left_anti")
        .select("doc_id", "lang", "quality", "bucket")
    )


def dd_curation_pipeline_sql(table: str = "documents") -> str:
    return f"""
WITH q AS (
  SELECT doc_id, quality FROM ({textstats.dd_quality_scores_sql(table)})
  WHERE quality >= {QUALITY_FLOOR}
),
exact_keep AS (
  SELECT keep_id AS doc_id FROM ({dedup.dd_dedup_exact_sql(table)})
),
near_drop AS (
  SELECT DISTINCT doc_b AS doc_id
  FROM ({dedup.dd_dedup_minhash_lsh_sql(table)})
),
sampled AS ({dd_stratified_sample_sql(table)})
SELECT s.doc_id, s.lang, q.quality, s.bucket
FROM sampled s
JOIN q ON s.doc_id = q.doc_id
WHERE s.doc_id IN (SELECT doc_id FROM exact_keep)
  AND s.doc_id NOT IN (SELECT doc_id FROM near_drop)
""".strip()
