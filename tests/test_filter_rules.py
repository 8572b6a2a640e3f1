"""Crafted-document pins for the paper filter rule sets (Gopher quality
+ repetition, C4 line filters) — the oracle parity gate checks value
equality on the corpus; these pin the SEMANTICS on documents built to
trip each rule exactly once."""

from __future__ import annotations

import pytest
from pyspark.sql.types import LongType, StringType, StructField, StructType

from duckdb_hybrid_doc_search_spark.operators import textstats

SCHEMA = StructType([
    StructField("doc_id", LongType()),
    StructField("text", StringType()),
])


def _docs(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


GOOD = (
    "The quick brown fox jumps over the lazy dog and then walks back "
    "to the barn with a friend that came along to have a look at the "
    "field where all of them like to rest when the day turns warm and "
    "quiet near the old stone wall that has stood there for years."
)


def test_gopher_quality_flags(spark):
    rows = [
        (0, GOOD),                                # passes everything
        (1, "too short to count"),                # < 50 words
        (2, GOOD + " " + "# " * 40),              # symbol ratio blown
        (3, "\n".join(["- bullet line with the words of and that have"]
                      * 20)),                     # 100% bullet lines
        (4, " ".join(["12345"] * 60)),            # no alpha, no stopwords
        # half the lines are bullets: the paper only removes docs with
        # MORE THAN 90% bullet lines, so this must KEEP (the pre-r8 gate
        # wrongly filtered at >10%)
        (5, "\n".join(["- a bullet line with the words of and that have",
                       "a plain line with the words of and that have"]
                      * 5)),
        # ellipsis-heavy but hash-free: the 0.1 symbol threshold applies
        # PER SYMBOL, so hash passes while ellipsis fails
        (6, GOOD + " " + "... " * 40),
    ]
    out = {r.doc_id: r for r in
           textstats.gopher_quality(_docs(spark, rows)).collect()}
    assert out[0].gopher_pass
    assert not out[1].f_word_count and not out[1].gopher_pass
    assert not out[2].f_symbol_hash and not out[2].gopher_pass
    assert not out[3].f_bullet_lines and not out[3].gopher_pass
    assert not out[4].f_alpha_words and not out[4].f_stopwords
    assert not out[4].gopher_pass
    assert out[5].f_bullet_lines
    assert out[6].f_symbol_hash and not out[6].f_symbol_ellipsis


def test_gopher_repetition_flags(spark):
    rows = [
        (0, GOOD),                                  # natural text passes
        # one 2-gram ("ha ha") repeated until it owns >20% of the chars
        (1, GOOD + " " + "ha ha" * 1 + " ha" * 40),
        # a 10-gram passage duplicated: >10% of chars inside dup 10-grams
        (2, "alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    ]
    out = {r.doc_id: r for r in
           textstats.gopher_repetition(_docs(spark, rows)).collect()}
    assert out[0].rep_pass
    assert not out[1].f_top2 and not out[1].rep_pass
    assert not out[2].f_dup10 and not out[2].rep_pass
    # mass accounting: doc 2's duplicated 10-gram block covers the doc
    assert out[2].dup10_chars > 0
    assert out[2].total_chars > 0


def test_gopher_top_gram_is_most_frequent(spark):
    """The 'top' gram is the MOST FREQUENT n-gram, not the one with
    maximal character mass: 'x y' occurs 5 times (mass 5*3=15) while the
    long pair occurs twice with mass 2*35=70 — the gate must use 15."""
    text = ("x y x y x y x y x y "
            "longlonglongword1 longlonglongword2 "
            "longlonglongword1 longlonglongword2")
    out = textstats.gopher_repetition(
        _docs(spark, [(0, text)])
    ).collect()[0]
    assert out.top2_chars == 15  # 5 occurrences * len('x y')


def test_c4_line_filters(spark):
    rows = [
        (0, "This line has five words here.\nshort line\n"
            "Another proper sentence with enough words follows here.\n"
            "Ends with punctuation but too short."),
        (1, "lorem ipsum dolor sit amet and more words follow here."),
        (2, "A js blob { with braces and words and sentences. More. "
            "Even more."),
        (3, "One sentence only no punctuation"),
    ]
    out = {r.doc_id: r for r in
           textstats.c4_line_filters(_docs(spark, rows)).collect()}
    # doc 0: 4 non-empty lines; kept = lines with >=5 words ending in
    # punctuation (line 1, 3, and 4 has 6 words -> kept too)
    assert out[0].n_lines == 4
    assert out[0].n_kept_lines == 3
    assert out[0].keep_page  # >= 3 sentences, no lorem, no brace
    assert out[1].has_lorem and not out[1].keep_page
    assert out[2].has_brace and not out[2].keep_page
    assert out[3].n_sentences == 0 and not out[3].keep_page


@pytest.mark.parametrize("n,expected", [(0, 1), (1, 1), (4, 2), (100, 10),
                                        (99, 9), (10_000, 100)])
def test_semdedup_mod_is_isqrt(n, expected):
    from duckdb_hybrid_doc_search_spark.operators.dedup import semdedup_mod

    assert semdedup_mod(n) == expected


def test_leakage_safe_split_never_straddles(spark, sf_dir):
    """No near-dup pair may cross split boundaries, every doc gets
    exactly one assignment, singleton clusters key by their own id,
    and the assignment is deterministic."""
    from pyspark.sql import functions as F

    from duckdb_hybrid_doc_search_spark.operators.curation import (
        leakage_safe_split,
    )
    from duckdb_hybrid_doc_search_spark.operators.dedup import (
        dedup_minhash_lsh,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = leakage_safe_split(docs)
    rows = out.collect()
    n_docs = docs.count()
    assert len(rows) == n_docs
    split_of = {r["doc_id"]: r["split"] for r in rows}
    cluster_of = {r["doc_id"]: r["cluster_id"] for r in rows}

    pairs = dedup_minhash_lsh(docs).select("doc_a", "doc_b").collect()
    assert len(pairs) > 0  # the guarantee must actually bite
    for p in pairs:
        assert split_of[p["doc_a"]] == split_of[p["doc_b"]], p
        assert cluster_of[p["doc_a"]] == cluster_of[p["doc_b"]], p

    paired = {p["doc_a"] for p in pairs} | {p["doc_b"] for p in pairs}
    for d, c in cluster_of.items():
        if d not in paired:
            assert c == d  # singleton keys by its own id

    again = {r["doc_id"]: r["split"]
             for r in leakage_safe_split(docs).collect()}
    assert again == split_of
    assert set(split_of.values()) == {"train", "val", "test"}
