"""Registrations for the pattern-mining / data-management family
(operators/mining.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..index.catalog import load_table
from ..operators import mining
from .registry import register


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


@register("basket_part_pairs", oracle=mining.dd_basket_part_pairs_sql())
def basket_part_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mining.basket_part_pairs(_t(spark, sf_dir, "lineitem"))


@register("orders_merge_upsert", oracle=mining.dd_orders_merge_upsert_sql())
def orders_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mining.orders_merge_upsert(_t(spark, sf_dir, "orders"))


@register("search_spell_suggest", oracle=mining.dd_spell_suggest_sql())
def search_spell_suggest(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mining.spell_suggest(_t(spark, sf_dir, "documents"))


@register("orders_incremental_agg_merge",
          oracle=mining.dd_incremental_agg_merge_sql())
def orders_incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial-aggregate merge (old slice + delta slice) == direct
    aggregate — the incremental view-maintenance correctness property."""
    return mining.incremental_agg_merge(_t(spark, sf_dir, "orders"))


@register("corpus_schema_profile", oracle=mining.dd_schema_profile_sql())
def corpus_schema_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style per-column null/distinct/min/max profile in one
    aggregate pass + stack unpivot."""
    return mining.schema_profile(_t(spark, sf_dir, "documents"))
