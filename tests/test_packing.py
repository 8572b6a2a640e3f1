"""Corpus-assembly operators: semantic invariants beyond oracle equality
(budget actually respected, caps actually capped, filters actually
filtering, decontamination actually finds planted overlap)."""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_hybrid_doc_search_spark.index.catalog import load_table
from duckdb_hybrid_doc_search_spark.operators import packing


def test_pack_token_budget_respected(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    budget = 5_000
    kept = packing.pack_token_budget(docs, budget)
    total = kept.agg(F.sum("n_tokens")).collect()[0][0] or 0
    assert total <= budget
    # deterministic: same call, same keep-set
    a = sorted(r.doc_id for r in kept.select("doc_id").collect())
    b = sorted(r.doc_id for r in
               packing.pack_token_budget(docs, budget).select("doc_id").collect())
    assert a == b


def test_pack_budget_monotone(spark, sf_dir):
    """A larger budget keeps a superset — the threshold-selection design
    means budgets only move the bucket cutoff forward."""
    docs = load_table(spark, sf_dir, "documents")
    small = {r.doc_id for r in
             packing.pack_token_budget(docs, 3_000).select("doc_id").collect()}
    large = {r.doc_id for r in
             packing.pack_token_budget(docs, 12_000).select("doc_id").collect()}
    assert small <= large


def test_lang_cap_enforced(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    cap = 7
    out = packing.lang_capped_sample(docs, cap)
    per_lang = out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    assert per_lang and all(r.n <= cap for r in per_lang)


def test_filtered_ann_only_returns_matching_lang(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    out = packing.filtered_ann_topk(emb, docs, "de", 5, 10)
    joined = out.join(
        docs.select(F.col("doc_id").alias("c_id"), "lang"), "c_id"
    )
    langs = {r.lang for r in joined.select("lang").distinct().collect()}
    assert langs == {"de"}


def test_decontaminate_finds_planted_overlap(spark):
    phrase = "alpha beta gamma delta epsilon"
    rows = [
        (0, f"benchmark doc holds {phrase} inside"),      # eval (id%100==0)
        (1, f"train doc leaks {phrase} verbatim"),        # contaminated
        (2, "clean training document with no overlap at all"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in packing.decontaminate_ngrams(docs).collect()}
    assert 1 in out and out[1].n_eval_docs_hit == 1
    assert out[1].n_shared_shingles >= 2  # 5-token phrase -> >=2 4-grams
    assert 2 not in out and 0 not in out


def test_pack_sequences_invariants(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    ctx = 256
    out = packing.pack_sequences(docs, ctx).collect()
    assert len(out) == docs.count()  # every doc assigned exactly once
    # bins respect the context unless a single doc overflows it alone
    bins = {}
    for r in out:
        bins.setdefault((r.group, r.bin_id), []).append(r.n_tokens)
    for (g, b), sizes in bins.items():
        assert sum(sizes) <= ctx or len(sizes) == 1, (g, b, sizes)
    # deterministic across runs
    again = packing.pack_sequences(docs, ctx).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_pack_sequences_oversize_doc_gets_own_bin(spark):
    rows = [(1, "en", "tok " * 10), (2, "en", "tok " * 500), (3, "en", "tok " * 10)]
    docs = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    out = packing.pack_sequences(docs, 64).collect()
    oversize = next(r for r in out if r.doc_id == 2)
    assert sum(1 for r in out if r.bin_id == oversize.bin_id
               and r.group == oversize.group) == 1


def test_mixture_weights_shares_sum_to_one(spark, sf_dir):
    """Both share columns are distributions over buckets; epochs fills the
    budget exactly: sum(epochs * tokens) == MIXTURE_BUDGET (up to the 6dp
    per-row rounding)."""
    from duckdb_hybrid_doc_search_spark.index.catalog import load_table
    from duckdb_hybrid_doc_search_spark.operators.curation import (
        MIXTURE_BUDGET, mixture_weights)

    docs = load_table(spark, sf_dir, "documents")
    rows = mixture_weights(docs).collect()
    assert abs(sum(r.natural_share for r in rows) - 1.0) < 1e-3
    assert abs(sum(r.mixture_share for r in rows) - 1.0) < 1e-3
    filled = sum(r.epochs * r.tokens for r in rows)
    assert abs(filled - MIXTURE_BUDGET) / MIXTURE_BUDGET < 1e-3
    # temperature damps the head: the largest bucket's mixture share
    # must not exceed its natural share
    big = max(rows, key=lambda r: r.tokens)
    assert big.mixture_share <= big.natural_share + 1e-9


def test_dsir_weights_favor_target_language(spark, sf_dir):
    # the whole point of DSIR: docs resembling the target (en) slice
    # should carry higher importance than docs that don't. With the
    # target LM fit on the en slice, mean log_importance of en docs
    # must exceed the non-en mean by a clear margin.
    from duckdb_hybrid_doc_search_spark.operators import curation

    docs = load_table(spark, sf_dir, "documents")
    w = curation.dsir_importance_weights(docs).collect()
    en = [r["log_importance"] for r in w if r["lang"] == "en"]
    other = [r["log_importance"] for r in w if r["lang"] != "en"]
    assert en and other
    assert sum(en) / len(en) > sum(other) / len(other)


def test_dsir_resample_is_deterministic_topk(spark, sf_dir):
    from duckdb_hybrid_doc_search_spark.operators import curation

    docs = load_table(spark, sf_dir, "documents")
    a = [tuple(r) for r in curation.dsir_gumbel_sample(docs, k=20).collect()]
    b = [tuple(r) for r in curation.dsir_gumbel_sample(docs, k=20).collect()]
    assert len(a) == 20
    assert a == b  # deterministic noise -> identical draw across runs
    scores = [r[3] for r in a]
    assert scores == sorted(scores, reverse=True)
