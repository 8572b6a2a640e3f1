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


#: default merges applied per training pass by batch-mode callers (the
#: written tokenizer layouts): bounds nested fold-expression depth while
#: cutting driver round-trips ~BPE_TRAIN_BATCH-fold on typical corpora.
BPE_TRAIN_BATCH = 8


def _select_merge_batch(top: list, max_m: int, complete: bool) -> list:
    """Prefix of the ranked pair list that is EXACTLY equivalent to
    applying the merges one at a time (r12 VERDICT #4 — batched
    Sennrich with a per-pair exactness proof, not a heuristic).

    The load-bearing fact: merging (a, b) destroys an occurrence of a
    DIFFERENT pair (c, d) only when the merge consumes c as its rhs
    (c == b, pattern "a b d") or d as its lhs (d == a, pattern
    "c a b"); existing-symbol pairs are never created. So (c, d)'s
    count survives merge (a, b) iff ``c != b and d != a`` — sharing a
    bare lhs or rhs is harmless, which is what lets the early-BPE
    shape (many "(x, </w>)" pairs sharing the end-of-word rhs) batch
    at all.

    1. Greedy PREFIX: take ranked pairs while each is count-invariant
       under every EARLIER selection (the directional rule above);
       stop at the first violator (or at ``max_m``). Prefix-ness gives
       two guarantees at sequential step k: (a) every excluded pair
       ranks after pair k, has an unchanged-or-smaller count, and
       loses a count tie by the lexicographic order the ranking
       already encodes (covering unseen pairs beyond a truncated
       collect too — they rank after the last seen row); (b) the only
       remaining threats are pairs CREATED by merges 1..k-1.
    2. CREATED-pair guard, per selected index k > 0: a pair created by
       merge (a, b) is (x, ab) or (ab, y), bounded by the PRE-batch
       count of (x, a) or (b, y) — a pair whose rhs is the merge's lhs
       or whose lhs is the merge's rhs. Such bounding pairs are never
       co-batched (they violate the directional rule against their
       merge in both orders), so they sit in the excluded tail with
       known counts. Keep pair k only while its count is STRICTLY
       greater than the max count among excluded threat pairs
       (er in kept_lhs or el in kept_rhs) for the already-kept merges —
       created strings are unknown, so a tie must not be risked; when
       the ranking was truncated (``complete`` False) the last seen
       row's count joins the bound for the unseen tail. Truncate at
       the first failure — keeping a later pair would break the prefix
       property its own proof needs.
    3. Fallback: an empty selection applies just the rank-1 pair — the
       sequential step, always exact.

    ``top`` rows carry (pair, c) ranked by (c desc, pair asc) — the
    sequential trainer's exact ordering, so in-batch order equals
    sequential order. Exactness is pinned merge-for-merge against the
    sequential trainer at 256 merges and on adversarial corpora
    (tests/test_bpe.py).
    """
    split = lambda row: tuple(row["pair"].split(" ", 1))  # noqa: E731
    prev_lhs: set[str] = set()
    prev_rhs: set[str] = set()
    prefix: list = []
    excluded: list = []
    for idx, row in enumerate(top):
        c, d = split(row)
        if len(prefix) >= max_m or c in prev_rhs or d in prev_lhs:
            excluded = top[idx:]
            break
        prefix.append(row)
        prev_lhs.add(c)
        prev_rhs.add(d)
    unseen_bound = -1 if complete else int(top[-1]["c"])
    kept: list = []
    kept_lhs: set[str] = set()
    kept_rhs: set[str] = set()
    for row in prefix:
        if kept:
            bound = unseen_bound
            for e in excluded:  # ranked desc: first threat is the max
                el, er = split(e)
                if er in kept_lhs or el in kept_rhs:
                    bound = max(bound, int(e["c"]))
                    break
            if int(row["c"]) <= bound:
                break
        kept.append(row)
        a, b = split(row)
        kept_lhs.add(a)
        kept_rhs.add(b)
    return kept or [top[0]]


def bpe_train(docs: DataFrame, n_merges: int = BPE_MERGES,
              batch: int = 1) -> DataFrame:
    """Learn ``n_merges`` BPE merges from the corpus; returns the merge
    table (rank, lhs, rhs, pair_count) as a DataFrame.

    Iterative by nature (like embeddings_kmeans_train): per PASS, one
    pair aggregate over the vocabulary-sized histogram, a bounded
    ranked collect, and a JVM-side fold rewrite per applied merge.
    ``batch`` > 1 applies up to that many mutually non-interacting
    merges per pass (see :func:`_select_merge_batch` — EXACT Sennrich
    equivalence, pinned at 256 merges in tests/test_bpe.py), cutting
    the driver round-trips that dominate training wall time: a
    production 32k-merge vocabulary at one aggregate per merge is hours
    of driver-bound round-trips (r12: 0.20-0.25s each, measured).
    Checkpointing every pass (every 4 merges when sequential) bounds
    the fold-lineage depth.
    """
    spark = docs.sparkSession
    hist = (
        word_histogram(docs)
        .select(_char_symbols(F.col("word")).alias("syms"), "wcnt")
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[int, str, str, int]] = []
    since_ckpt = 0
    while len(merges) < n_merges:
        want = min(max(1, batch), n_merges - len(merges))
        # collect well past the batch size: the created-pair guard
        # scans the excluded tail for symbol overlaps, and a COMPLETE
        # ranking (len < limit) removes the conservative unseen-pair
        # bound entirely — a few hundred tiny driver rows per pass,
        # cheap next to the aggregate they ride on
        limit = max(32 * want, 256) if batch > 1 else 1
        top = (
            hist.select(
                F.explode(_adjacent_pairs(F.col("syms"))).alias("pair"),
                "wcnt",
            )
            .groupBy("pair")
            .agg(F.sum("wcnt").alias("c"))
            .orderBy(F.desc("c"), F.asc("pair"))
            .limit(limit)
            .collect()
        )
        if not top:
            break  # vocabulary fully merged: no adjacent pairs left
        selected = _select_merge_batch(top, want,
                                       complete=len(top) < limit)
        expr = F.col("syms")
        for row in selected:
            lhs, rhs = row["pair"].split(" ", 1)
            merges.append((len(merges), lhs, rhs, int(row["c"])))
            expr = _apply_merge(expr, lhs, rhs)
        hist = hist.select(expr.alias("syms"), "wcnt")
        since_ckpt += len(selected)
        if since_ckpt >= 4 and len(merges) < n_merges:
            hist = hist.localCheckpoint(eager=True)
            since_ckpt = 0
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
        merge_rows = bpe_train(docs, n_merges,
                               batch=BPE_TRAIN_BATCH).collect()
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


# --- DuckDB oracle: full training + encoding, SQL-expressed ------------------
#
# The trainer is deterministic (count-desc / smallest-"lhs rhs" tie-break),
# so its 16 merges unroll into 16 CTE stages (r10 VERDICT #8): per stage,
# one pair aggregate, a LIMIT-1 argmax, and a left-to-right merge rewrite.
# The rewrite is a list_reduce FOLD over the symbol list with a string
# accumulator (symbols joined by chr(31), which cannot occur in a symbol:
# tokens are [a-z0-9]+ plus the EOW marker) — the exact DuckDB twin of
# _apply_merge's F.aggregate fold. Encoding is a recursive CTE applying
# the lowest-rank applicable merge per word per step (subword-nmt's
# priority loop, i.e. _segment_word), terminating when no merge applies.

#: ASCII unit separator: joins the fold accumulator's symbols.
_SEP = "chr(31)"


def _dd_fold_rewrite(syms_expr: str, lhs: str, rhs: str) -> str:
    """One merge applied left-to-right to a symbol list: the list_reduce
    fold twin of :func:`_apply_merge` (`lhs`/`rhs` are SQL expressions,
    typically columns of a 1-row argmax CTE)."""
    return f"""CASE WHEN len({syms_expr}) < 2 THEN {syms_expr}
      ELSE string_split(list_reduce({syms_expr}, (acc, x) -> CASE
        WHEN (acc = {lhs} OR ends_with(acc, {_SEP} || {lhs})) AND x = {rhs}
        THEN substr(acc, 1, length(acc) - length({lhs})) || {lhs} || {rhs}
        ELSE acc || {_SEP} || x END), {_SEP}) END"""


def dd_bpe_merges_ctes(table: str = "documents",
                       n_merges: int = BPE_MERGES) -> str:
    """CTE chain deriving the SAME merge table the Spark trainer learns:
    wh -> seg0 -> (pc_k, best_k, seg_{k+1})*n -> merges(rank, lhs, rhs,
    pair_count). If the vocabulary merges out early, later best_k CTEs
    are empty and the union is simply shorter — the Spark trainer's
    `break`."""
    parts = [f"""wh AS MATERIALIZED (
  SELECT word, count(*)::BIGINT AS wcnt
  FROM (SELECT unnest({dd_tokenize('text')}) AS word FROM {table})
  GROUP BY word
),
seg0 AS MATERIALIZED (
  SELECT list_append(regexp_extract_all(word, '.'), '{EOW}') AS syms, wcnt
  FROM wh
)"""]
    for k in range(n_merges):
        parts.append(f"""pc{k} AS MATERIALIZED (
  SELECT syms[i] AS lhs, syms[i+1] AS rhs, sum(wcnt)::BIGINT AS c
  FROM (SELECT unnest(range(1, len(syms))) AS i, syms, wcnt FROM seg{k})
  GROUP BY 1, 2
),
best{k} AS MATERIALIZED (
  SELECT {k}::INTEGER AS rank, lhs, rhs, c AS pair_count
  FROM pc{k} ORDER BY c DESC, lhs || ' ' || rhs ASC LIMIT 1
),
seg{k + 1} AS MATERIALIZED (
  SELECT {_dd_fold_rewrite('syms', 'b.lhs', 'b.rhs')} AS syms, wcnt
  FROM seg{k} CROSS JOIN best{k} b
)""")
    union = "\nUNION ALL\n".join(
        f"  SELECT rank, lhs, rhs, pair_count FROM best{k}"
        for k in range(n_merges)
    )
    parts.append(f"merges AS MATERIALIZED (\n{union}\n)")
    return ",\n".join(parts)


def dd_bpe_train_sql(table: str = "documents",
                     n_merges: int = BPE_MERGES) -> str:
    """Full-oracle twin of :func:`bpe_train` (upgrades text_bpe_train
    from rows-only to hash-gated)."""
    return f"""
WITH {dd_bpe_merges_ctes(table, n_merges)}
SELECT rank, lhs, rhs, pair_count FROM merges ORDER BY rank
""".strip()


def dd_bpe_encode_ctes() -> str:
    """Recursive CTEs encoding every `vocab(word)` row with the `merges`
    table: per step, apply the lowest-rank merge whose pair is adjacent
    in the word (the _segment_word priority loop); a word with no
    applicable merge drops out of the recursion, and `encoded` keeps
    each word's final segmentation. Requires WITH RECURSIVE."""
    return f"""wseg0 AS MATERIALIZED (
  SELECT word, list_append(regexp_extract_all(word, '.'), '{EOW}') AS syms
  FROM vocab
),
enc AS (
  SELECT word, syms, 0 AS it FROM wseg0
  UNION ALL
  SELECT e2.word,
         {_dd_fold_rewrite('e2.syms', 'm.lhs', 'm.rhs')} AS syms,
         e2.it + 1
  FROM (
    SELECT e.*, (
      SELECT min(mm.rank) FROM merges mm
      WHERE list_contains(
        list_transform(range(1, len(e.syms)),
                       i -> e.syms[i] || {_SEP} || e.syms[i+1]),
        mm.lhs || {_SEP} || mm.rhs)
    ) AS next_rank
    FROM enc e
  ) e2
  JOIN merges m ON m.rank = e2.next_rank
),
encoded AS MATERIALIZED (
  SELECT word, syms AS subwords FROM (
    SELECT word, syms, it, max(it) OVER (PARTITION BY word) AS mx FROM enc
  ) WHERE it = mx
)"""


def _dd_dwc_cte(table: str = "documents") -> str:
    """The (doc_id, word, wcnt) MATERIALIZED CTE both BPE oracle blocks
    share — one definition of the corpus-scale pass."""
    return f"""dwc AS MATERIALIZED (
  SELECT doc_id, word, count(*)::BIGINT AS wcnt
  FROM (SELECT doc_id, unnest({dd_tokenize('text')}) AS word FROM {table})
  GROUP BY doc_id, word
)"""


def dd_bpe_bm25_ctes(query: str, table: str = "documents",
                     n_merges: int = BPE_MERGES,
                     train_table: str | None = None) -> str:
    """Composable CTE block ending in `bm25_scored(doc_id, score)` over
    the BPE-analyzed subword index — shared by the standalone top-k
    oracle and the hybrid-search variant (one block, so the analyzer's
    fusion semantics cannot diverge between them). The caller's WITH
    must be `WITH RECURSIVE` (the encoder CTE). ``train_table`` (a
    table name or parenthesized subquery) trains the merges on a
    DIFFERENT corpus slice than the postings corpus — the incremental
    store's frozen-tokenizer rule (merges from the base build, appended
    docs encoded with them)."""
    from ..config import SCORE_ROUND
    from ..models.tokenizer import tokenize_query
    from .bm25 import BM25_B, BM25_K1

    qwords = sorted(set(tokenize_query(query)))
    if not qwords:
        # `VALUES ()` is a DuckDB parse error — fail fast Python-side
        raise ValueError(
            f"query {query!r} tokenizes to zero words: the BPE BM25 "
            "oracle cannot be built for an empty term set"
        )
    qvals = ", ".join("('" + w.replace("'", "''") + "')" for w in qwords)
    return f"""
{dd_bpe_merges_ctes(train_table or table, n_merges)},
{_dd_dwc_cte(table)},
qwords(word) AS (VALUES {qvals}),
-- DISTINCT-over-UNION-ALL, not a bare UNION: under WITH RECURSIVE DuckDB
-- gives a two-part top-level UNION recursive-CTE semantics (base/step),
-- which silently skips the dedup and iterates the second branch
vocab AS MATERIALIZED (
  SELECT DISTINCT word FROM (
    SELECT word FROM dwc UNION ALL SELECT word FROM qwords)
),
{dd_bpe_encode_ctes()},
postings AS MATERIALIZED (
  SELECT term, doc_id, sum(wcnt)::BIGINT AS tf FROM (
    SELECT d.doc_id, unnest(e.subwords) AS term, d.wcnt
    FROM dwc d JOIN encoded e USING (word))
  GROUP BY term, doc_id
),
dsum AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM postings GROUP BY doc_id),
docstats AS (
  SELECT d.doc_id, coalesce(s.dl, 0)::BIGINT AS dl
  FROM {table} d LEFT JOIN dsum s USING (doc_id)
),
docfreq AS (SELECT term, count(*)::BIGINT AS df FROM postings GROUP BY term),
corpus_stats AS (
  SELECT count(*)::BIGINT AS n_docs, avg(dl) AS avgdl FROM docstats
),
qterms AS (
  SELECT DISTINCT unnest(subwords) AS term
  FROM qwords JOIN encoded USING (word)
),
bm25_scored AS (
  SELECT p.doc_id,
         round(sum(
           ln(1.0 + (cs.n_docs - d.df + 0.5) / (d.df + 0.5))
           * p.tf * {BM25_K1 + 1.0}
           / (p.tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * ds.dl / cs.avgdl))
         ), {SCORE_ROUND}) AS score
  FROM postings p
  JOIN docfreq d USING (term)
  JOIN docstats ds USING (doc_id)
  CROSS JOIN corpus_stats cs
  WHERE p.term IN (SELECT term FROM qterms)
  GROUP BY p.doc_id
)
""".strip()


def dd_bm25_bpe_topk_sql(query: str, k: int,
                         table: str = "documents",
                         n_merges: int = BPE_MERGES) -> str:
    """Oracle twin of :func:`bm25_bpe_topk`: trains the merges, encodes
    the corpus vocabulary AND the query words with them, then runs the
    standard BM25 arithmetic over subword postings."""
    return f"""
WITH RECURSIVE
{dd_bpe_bm25_ctes(query, table, n_merges)}
SELECT doc_id, score FROM bm25_scored
ORDER BY score DESC, doc_id ASC LIMIT {k}
""".strip()


def dd_bm25_bpe_incremental_sql(query: str, k: int,
                                table: str = "documents",
                                n_merges: int = BPE_MERGES) -> str:
    """Oracle for the SEGMENTED subword store's probe: merges trained on
    the BASE slice only (doc_id % 7 <> 3 — index/fts_layout's segment
    split), every document (base + appended) encoded with that frozen
    set, BM25 over the full corpus. The frozen-tokenizer maintenance
    contract, SQL-expressed."""
    from ..index.fts_layout import SEG_SPLIT_MOD, SEG_SPLIT_REM

    train = (f"(SELECT * FROM {table} "
             f"WHERE doc_id % {SEG_SPLIT_MOD} <> {SEG_SPLIT_REM})")
    return f"""
WITH RECURSIVE
{dd_bpe_bm25_ctes(query, table, n_merges, train_table=train)}
SELECT doc_id, score FROM bm25_scored
ORDER BY score DESC, doc_id ASC LIMIT {k}
""".strip()


# --- BPE-analyzed BM25 (Spark side) -------------------------------------------


def _doc_word_counts(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """(id, word, wcnt): the corpus aggregated to the word grain per
    document — THE one corpus-scale pass every BPE consumer shares
    (index build, per-doc token counts); everything downstream is
    vocabulary-sized."""
    spark = docs.sparkSession
    return (
        docs.repartition(spark.sparkContext.defaultParallelism)
        .select(id_col, F.explode(tokenize(F.col(text_col))).alias("word"))
        .groupBy(id_col, "word")
        .agg(F.count(F.lit(1)).alias("wcnt"))
    )


def bpe_fts_index(docs: DataFrame, merge_rows: list,
                  id_col: str = "doc_id",
                  text_col: str = "text") -> dict[str, DataFrame]:
    """The four FTS index tables over BPE SUBWORD tokens — the standard
    subword-FTS remedy for whole-token BM25's silent degradation on
    unseen-vocabulary queries (reference searcher.py's FTS is whole-
    token; this is the alternative analyzer, tokenizer identity
    preserved: build and query use the SAME stored merges).

    Scale shape: corpus text is aggregated to (doc_id, word, wcnt)
    first (one shuffle, the word_histogram grain); only the DISTINCT
    vocabulary is segmented in Python (Arrow-batched); subword postings
    come from a vocabulary-sized hash join back. Empty docs keep a
    dl=0 docstats row so n_docs matches the word analyzer's."""
    dwc = _doc_word_counts(docs, id_col, text_col)
    vocab = bpe_segment_vocab(dwc.select("word").distinct(), merge_rows)
    enc = dwc.join(vocab, "word")
    postings = (
        enc
        .select(id_col, F.explode("subwords").alias("term"), "wcnt")
        .groupBy("term", id_col)
        .agg(F.sum("wcnt").alias("tf"))
    )
    # dl per doc = sum(tf) over the doc's postings = sum over words of
    # wcnt * len(subwords) — the bpe_doc_token_counts identity. Deriving
    # it from `enc` (r14) keeps the docstats branch explode-free: the
    # full-vocabulary subword explode + (term, doc) + (doc) double
    # aggregation ran per execution ONLY to recompute this sum, while
    # every other postings consumer prunes to the query terms.
    dsum = enc.groupBy(id_col).agg(
        F.sum(F.col("wcnt") * F.size("subwords")).alias("dl"))
    docstats = (
        docs.select(id_col)
        .join(dsum, id_col, "left")
        .select(id_col,
                F.coalesce(F.col("dl"), F.lit(0)).cast("long").alias("dl"))
    )
    docfreq = postings.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"))
    # (r15: a (count of docs) x (sum of dsum.dl) crossJoin form was
    # tried here and measured ~0.2s SLOWER at sf0.1 — it added two
    # stages to the corpus_stats critical chain; reverted)
    corpus_stats = docstats.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    return {
        "postings": postings,
        "docfreq": docfreq,
        "docstats": docstats,
        "corpus_stats": corpus_stats,
    }


def encode_query_terms(query: str, merge_rows: list) -> list[str]:
    """Query-side encoding with the SAME stored merges the index was
    built with (§2.6.5 tokenizer identity — driver-side work over a
    handful of words and n_merges ranks)."""
    from ..models.tokenizer import tokenize_query

    ranks = {(m["lhs"], m["rhs"]): int(m["rank"]) for m in merge_rows}
    terms: list[str] = []
    for w in tokenize_query(query):
        terms.extend(_segment_word(w, ranks))
    return terms


def bm25_bpe_topk(docs: DataFrame, query: str, k: int,
                  merge_rows: list) -> DataFrame:
    """BM25 top-k over the BPE-analyzed index — shares bm25_scores'
    Okapi arithmetic with the word analyzer; only the token stream
    differs."""
    from .bm25 import bm25_scores

    index = bpe_fts_index(docs, merge_rows)
    return (
        bm25_scores(index, encode_query_terms(query, merge_rows))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def dd_bpe_encode_stats_sql(table: str = "documents",
                            n_merges: int = BPE_MERGES) -> str:
    """Oracle twin of :func:`bpe_encode_stats` (upgrades
    text_bpe_encode_stats from rows-only): derive the merges (the
    trainer's unrolled stages), encode the distinct vocabulary with the
    recursive priority loop, and aggregate fertility / chars-per-token
    per language slice."""
    from ..config import SCORE_ROUND

    return f"""
WITH RECURSIVE
{dd_bpe_merges_ctes(table, n_merges)},
blw AS MATERIALIZED (
  SELECT lang, word, count(*)::BIGINT AS cnt
  FROM (SELECT lang, unnest({dd_tokenize('text')}) AS word FROM {table})
  GROUP BY lang, word
),
vocab AS MATERIALIZED (SELECT DISTINCT word FROM blw),
{dd_bpe_encode_ctes()},
j AS (
  SELECT b.lang, b.cnt, length(b.word) AS wlen, len(e.subwords) AS n_sub
  FROM blw b JOIN encoded e USING (word)
)
SELECT lang,
       sum(cnt)::BIGINT AS n_words,
       sum(cnt * n_sub)::BIGINT AS n_bpe_tokens,
       round(sum(cnt * n_sub)::DOUBLE / sum(cnt), {SCORE_ROUND})
         AS fertility,
       round(sum(cnt * wlen)::DOUBLE / sum(cnt * n_sub), {SCORE_ROUND})
         AS chars_per_token
FROM j GROUP BY lang ORDER BY lang
""".strip()


def bpe_doc_token_counts(docs: DataFrame, merge_rows: list,
                         id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens): per-document TOKENIZER token counts under the
    stored merges — what a training budget actually meters (whitespace
    word counts under-count by the fertility factor, ~4x on this
    corpus). Same vocabulary-only-in-Python shape as bpe_fts_index;
    empty docs keep an n_tokens=0 row."""
    dwc = _doc_word_counts(docs, id_col, text_col)
    vocab = bpe_segment_vocab(dwc.select("word").distinct(), merge_rows)
    dsum = (
        dwc.join(vocab.select("word", F.size("subwords").alias("n_sub")),
                 "word")
        .groupBy(id_col)
        .agg(F.sum(F.col("wcnt") * F.col("n_sub")).alias("dl"))
    )
    return (
        docs.select(id_col)
        .join(dsum, id_col, "left")
        .select(id_col,
                F.coalesce(F.col("dl"), F.lit(0)).cast("long")
                .alias("n_tokens"))
    )


def dd_bpe_doc_counts_ctes(table: str = "documents",
                           n_merges: int = BPE_MERGES) -> str:
    """CTE block ending in `bpe_counts(doc_id, n_tokens)` — per-doc
    tokenizer token counts under the derived merges. Caller's WITH must
    be RECURSIVE."""
    return f"""
{dd_bpe_merges_ctes(table, n_merges)},
{_dd_dwc_cte(table)},
vocab AS MATERIALIZED (SELECT DISTINCT word FROM dwc),
{dd_bpe_encode_ctes()},
dsum AS (
  SELECT d.doc_id, sum(d.wcnt * len(e.subwords))::BIGINT AS dl
  FROM dwc d JOIN encoded e USING (word) GROUP BY d.doc_id
),
bpe_counts AS (
  SELECT t.doc_id, coalesce(s.dl, 0)::BIGINT AS n_tokens
  FROM {table} t LEFT JOIN dsum s USING (doc_id)
)
""".strip()
