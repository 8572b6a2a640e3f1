"""Distributed BPE tokenizer training and application.

The operation a training-data pipeline runs before anything else:
learn a subword vocabulary from the corpus (Sennrich, Haddow & Birch,
"Neural Machine Translation of Rare Words with Subword Units", ACL
2016) and measure how the learned tokenizer segments the data
(fertility, compression) per corpus slice.

Scale shape (the 100 TB contract):

- The ONLY corpus-scale pass is ``tokenize -> explode -> groupBy(word)``
  producing the word histogram — one map-side-combined shuffle, the
  same shape as FTS index construction. This is the classic Sennrich
  pre-aggregation: identical words are counted once, so everything
  after it is vocabulary-sized (distinct words), orders of magnitude
  smaller than the corpus.
- Each training merge is one tiny aggregate over the histogram's
  adjacent symbol pairs plus one JVM-side ``F.aggregate`` fold rewrite
  (no Python in the loop); only the argmax ROW (1 row) ever reaches
  the driver per merge — the bounded-scalar pattern the kmeans loop
  already uses. The histogram is localCheckpoint'ed every few merges
  to keep the fold lineage shallow; at 100 TB that materializes a
  vocabulary-sized table per few merges, which is the honest price of
  exact (non-approximate) BPE training.
- Encoding touches each DISTINCT word exactly once (an Arrow-batched
  pandas UDF over the vocabulary), then joins subword counts back to
  the corpus-level (slice, word) aggregate — corpus text never crosses
  the JVM/Python boundary, only the vocabulary does.

The merge-pair tie-break is deterministic everywhere: highest pair
count, then lexicographically smallest "lhs rhs" string — mirrored
exactly by the pure-Python reference in tests/test_bpe.py.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..config import SCORE_ROUND
from ..functions.text import dd_tokenize, tokenize

#: end-of-word marker (Sennrich '</w>'); tokens are [a-z0-9]+ so it can
#: never collide with a character symbol.
EOW = "</w>"

#: merges learned by the registered diagnostic queries. Enough to form
#: real multi-character subwords on the test corpora while keeping the
#: iterative trainer in the same cost tier as embeddings_kmeans_train.
BPE_MERGES = 16

#: rows returned by the oracled initial-pair-statistics query.
BPE_TOP_PAIRS = 50

MERGES_SCHEMA = StructType(
    [
        StructField("rank", IntegerType(), False),
        StructField("lhs", StringType(), False),
        StructField("rhs", StringType(), False),
        StructField("pair_count", LongType(), False),
    ]
)


def word_histogram(docs: DataFrame) -> DataFrame:
    """(word, wcnt) over the corpus — the one corpus-scale pass.

    Repartitioned before tokenize for the same reason as
    bm25.tokenize_docs: a single-file local input would otherwise
    tokenize on ONE split.
    """
    spark = docs.sparkSession
    return (
        docs.repartition(spark.sparkContext.defaultParallelism)
        .select(F.explode(tokenize(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wcnt"))
    )


def _char_symbols(word: Column) -> Column:
    """word -> [c1, c2, ..., EOW]."""
    return F.concat(
        F.regexp_extract_all(word, F.lit("."), 0), F.array(F.lit(EOW))
    )


def _adjacent_pairs(syms: Column) -> Column:
    """Space-joined adjacent symbol pairs (array-builder codegen, the
    arrays_zip-of-slices shape measured fastest in bigram_pmi).
    Symbols are alnum runs and/or the EOW marker — never contain a
    space, so the joined string is unambiguous."""
    n = F.size(syms)
    return F.when(
        n >= 2,
        F.transform(
            F.arrays_zip(F.slice(syms, 1, n - 1), F.slice(syms, 2, n - 1)),
            lambda s: F.concat_ws(" ", s["0"], s["1"]),
        ),
    ).otherwise(F.array().cast("array<string>"))


def bpe_pair_counts(docs: DataFrame, top_n: int = BPE_TOP_PAIRS) -> DataFrame:
    """Initial BPE pair statistics: adjacent character-pair counts over
    the word histogram (each pair weighted by its word's corpus
    frequency) — the rank-0 merge candidates. Fully SQL-expressible,
    so this is the oracled anchor of the family."""
    wh = word_histogram(docs)
    return (
        wh.select(
            F.explode(_adjacent_pairs(_char_symbols(F.col("word")))).alias(
                "pair"
            ),
            "wcnt",
        )
        .groupBy("pair")
        .agg(F.sum("wcnt").alias("pair_count"))
        .select(
            F.split(F.col("pair"), " ").getItem(0).alias("lhs"),
            F.split(F.col("pair"), " ").getItem(1).alias("rhs"),
            "pair_count",
        )
        .orderBy(F.desc("pair_count"), F.asc("lhs"), F.asc("rhs"))
        .limit(top_n)
    )


def dd_bpe_pair_counts_sql(
    top_n: int = BPE_TOP_PAIRS, table: str = "documents"
) -> str:
    return f"""
WITH wh AS (
  SELECT word, count(*)::BIGINT AS wcnt
  FROM (SELECT unnest({dd_tokenize('text')}) AS word FROM {table})
  GROUP BY word
),
s AS (
  SELECT list_append(regexp_extract_all(word, '.'), '{EOW}') AS syms, wcnt
  FROM wh
),
p AS (
  SELECT unnest(list_transform(range(1, len(syms)),
                               i -> syms[i] || ' ' || syms[i+1])) AS pair,
         wcnt
  FROM s
)
SELECT string_split(pair, ' ')[1] AS lhs,
       string_split(pair, ' ')[2] AS rhs,
       sum(wcnt)::BIGINT AS pair_count
FROM p
GROUP BY pair
ORDER BY pair_count DESC, lhs ASC, rhs ASC
LIMIT {top_n}
""".strip()


def _apply_merge(syms: Column, lhs: str, rhs: str) -> Column:
    """One merge applied left-to-right inside the JVM: fold over the
    symbol array, replacing the accumulator's tail with the merged
    symbol whenever (tail == lhs, next == rhs). Equivalent to the
    textbook while-loop (a merged symbol can never re-match as lhs
    within the same pass because lhs+rhs != lhs). F.get never throws
    on the empty accumulator, unlike element_at under ANSI."""
    merged = lhs + rhs

    def step(acc: Column, s: Column) -> Column:
        last = F.get(acc, F.size(acc) - 1)
        return F.when(
            (last == F.lit(lhs)) & (s == F.lit(rhs)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(s)))

    return F.aggregate(syms, F.array().cast("array<string>"), step)


def bpe_train(docs: DataFrame, n_merges: int = BPE_MERGES) -> DataFrame:
    """Learn ``n_merges`` BPE merges from the corpus; returns the merge
    table (rank, lhs, rhs, pair_count) as a DataFrame.

    Iterative by nature (like embeddings_kmeans_train): per merge, one
    pair aggregate over the vocabulary-sized histogram, a 1-row argmax
    collect, and a JVM-side fold rewrite. Checkpointing every 4 merges
    bounds the fold-lineage depth.
    """
    spark = docs.sparkSession
    hist = (
        word_histogram(docs)
        .select(_char_symbols(F.col("word")).alias("syms"), "wcnt")
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        top = (
            hist.select(
                F.explode(_adjacent_pairs(F.col("syms"))).alias("pair"),
                "wcnt",
            )
            .groupBy("pair")
            .agg(F.sum("wcnt").alias("c"))
            .orderBy(F.desc("c"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not top:
            break  # vocabulary fully merged: no adjacent pairs left
        pair, cnt = top[0]["pair"], int(top[0]["c"])
        lhs, rhs = pair.split(" ", 1)
        merges.append((rank, lhs, rhs, cnt))
        hist = hist.select(
            _apply_merge(F.col("syms"), lhs, rhs).alias("syms"), "wcnt"
        )
        if (rank + 1) % 4 == 0 and rank + 1 < n_merges:
            hist = hist.localCheckpoint(eager=True)
    return spark.createDataFrame(merges, MERGES_SCHEMA)


def _segment_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Encode one word with trained merges: repeatedly apply the
    lowest-rank pair present, merging all its non-overlapping
    occurrences left-to-right (subword-nmt's encode)."""
    syms: list[str] = list(word) + [EOW]
    while len(syms) > 1:
        best_rank = None
        best_pair = None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (syms[i], syms[i + 1])
        if best_pair is None:
            break
        lhs, rhs = best_pair
        out: list[str] = []
        i = 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == lhs and syms[i + 1] == rhs:
                out.append(lhs + rhs)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_segment_vocab(words: DataFrame, merge_rows: list) -> DataFrame:
    """Segment each DISTINCT word once (vocabulary-sized Python work,
    Arrow-batched); adds ``subwords: array<string>``. The rank dict is
    n_merges entries, shipped in the UDF closure."""
    ranks = {(m["lhs"], m["rhs"]): int(m["rank"]) for m in merge_rows}

    @F.pandas_udf(ArrayType(StringType()))
    def seg(col: pd.Series) -> pd.Series:
        return col.map(lambda w: _segment_word(w, ranks))

    return words.withColumn("subwords", seg(F.col("word")))


def bpe_encode_stats(
    docs: DataFrame, n_merges: int = BPE_MERGES, merge_rows: list | None = None
) -> DataFrame:
    """Measure a BPE tokenizer over the corpus per language slice:
    word/subword-token totals, fertility (BPE tokens per word — the
    standard tokenizer-quality metric) and compression (word chars per
    BPE token). ``merge_rows`` supplies a trained tokenizer (the
    written layout, index/bpe_layout.py — production applies a stored
    tokenizer, it doesn't retrain per query); without it, trains fresh.

    Corpus text is aggregated to (lang, word, cnt) first — one shuffle,
    the same grain the histogram pass already proved — and only the
    vocabulary is segmented in Python; the join back is a hash join on
    word (vocabulary-sized build side, never the corpus).
    """
    if merge_rows is None:
        merge_rows = bpe_train(docs, n_merges).collect()  # n_merges rows
    spark = docs.sparkSession
    by_lang_word = (
        docs.repartition(spark.sparkContext.defaultParallelism)
        .select("lang", F.explode(tokenize(F.col("text"))).alias("word"))
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    vocab = bpe_segment_vocab(
        by_lang_word.select("word").distinct(), merge_rows
    ).select("word", F.size("subwords").alias("n_sub"))
    return (
        by_lang_word.join(vocab, "word")
        .groupBy("lang")
        .agg(
            F.sum("cnt").alias("n_words"),
            F.sum(F.col("cnt") * F.col("n_sub")).alias("n_bpe_tokens"),
            F.sum(F.col("cnt") * F.length("word")).alias("n_word_chars"),
        )
        .select(
            "lang",
            "n_words",
            "n_bpe_tokens",
            F.round(
                F.col("n_bpe_tokens") / F.col("n_words"), SCORE_ROUND
            ).alias("fertility"),
            F.round(
                F.col("n_word_chars") / F.col("n_bpe_tokens"), SCORE_ROUND
            ).alias("chars_per_token"),
        )
        .orderBy("lang")
    )
