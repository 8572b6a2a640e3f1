"""Corpus-assembly operators: filtered vector search, token-budget
selection, per-group caps, benchmark decontamination.

The remaining "make the training set" surface beyond dedup/quality
(operators/curation.py): every operator is deterministic (hash priorities,
never rand()) so each has an exact DuckDB oracle, and every plan shape is
chosen for the 100 TB case — metadata filters run BEFORE any distance
math, budget selection is a bucket-histogram threshold (never a global
running sum over a single sorted partition), caps are per-group windows
(bounded partitions), and decontamination is a shingle equi-join (never a
cross join against the benchmark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.hashing import dd_h64, h64
from ..functions.text import dd_tokenize, tokenize

# --- attribute-filtered vector search ---------------------------------------


def filtered_ann_topk(emb: DataFrame, docs: DataFrame, lang: str,
                      k: int, n_queries: int) -> DataFrame:
    """Top-k cosine neighbors restricted to documents with a given lang —
    the filtered-vector-search shape every vector store serves.

    The metadata filter lands on the CORPUS side before any distance is
    computed (filter -> semi-join -> score), so scan+compute cost tracks
    the filtered slice; scoring after the fact and discarding would pay
    the full corpus. Queries themselves are unrestricted probes.
    """
    from .knn import knn_join

    allowed = docs.where(F.col("lang") == lang).select(
        F.col("doc_id").alias("c_id")
    )
    corpus = emb.select(
        F.col("vec_id").alias("c_id"), F.col("embedding").alias("c_vec")
    ).join(allowed, "c_id", "left_semi")
    queries = emb.where(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    return knn_join(queries, corpus, k)


def dd_filtered_ann_topk_sql(lang: str, k: int, n_queries: int) -> str:
    from .knn import dd_knn_join_sql

    queries_sql = (
        f"SELECT vec_id AS q_id, embedding AS q_vec FROM embeddings "
        f"WHERE vec_id < {n_queries}"
    )
    corpus = (
        "(SELECT e.* FROM embeddings e JOIN documents d "
        f"ON e.vec_id = d.doc_id WHERE d.lang = '{lang}')"
    )
    return dd_knn_join_sql(k, queries_sql, table=corpus)


# --- token-budget selection -------------------------------------------------

BUDGET_BUCKETS = 1_000


def pack_token_budget(docs: DataFrame, budget_tokens: int) -> DataFrame:
    """Select a highest-priority subset whose total token count fits a
    budget — the "assemble N tokens of training data" operator.

    Priority is a deterministic per-doc hash (reproducible across runs and
    engines). Selection is threshold-based, the scale-safe shape: bucket
    the priority space (BUDGET_BUCKETS buckets), aggregate tokens per
    bucket (one shuffle of BUCKETS rows), prefix-sum the tiny bucket
    histogram, pick the last bucket whose cumulative total fits, and keep
    every doc in buckets up to the cutoff. No global sort of the corpus,
    no running sum over one partition — the only ordered pass is over the
    1000-row histogram. The budget rounds DOWN to a bucket boundary
    (documented contract; finer granularity = more buckets).

    Output: doc_id, n_tokens, priority bucket — the kept set.
    """
    toks = docs.select(
        "doc_id",
        F.size(tokenize(F.col("text"))).cast("long").alias("n_tokens"),
    )
    return _pack_by_counts(toks, budget_tokens)


def _pack_by_counts(counts: DataFrame, budget_tokens: int) -> DataFrame:
    """The bucket-histogram threshold selection over any (doc_id,
    n_tokens) frame — shared by the whitespace budget and the
    BPE-tokenizer budget (the counting differs, the selection must
    not)."""
    pri = F.pmod(
        h64(F.concat(F.lit("pack#"), F.col("doc_id").cast("string"))),
        F.lit(BUDGET_BUCKETS),
    )
    toks = counts.select("doc_id", "n_tokens", pri.alias("bucket"))
    hist = toks.groupBy("bucket").agg(F.sum("n_tokens").alias("btoks"))
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )  # 1000 rows max: single-partition window over the HISTOGRAM only
    cutoff = (
        hist.withColumn("cum", F.sum("btoks").over(w))
        .where(F.col("cum") <= budget_tokens)
        .agg(F.max("bucket").alias("max_bucket"))
    )
    return (
        toks.crossJoin(F.broadcast(cutoff))
        .where(F.col("bucket") <= F.col("max_bucket"))
        .select("doc_id", "n_tokens", "bucket")
    )


def pack_bpe_token_budget(docs: DataFrame, merge_rows: list,
                          budget_tokens: int) -> DataFrame:
    """pack_token_budget metered in TOKENIZER tokens (the stored BPE
    merges) instead of whitespace words — the budget a training run
    actually enforces: whitespace counts under-meter by the fertility
    factor (~4x on this corpus), so a "100k-token" whitespace budget
    would ship ~400k real tokens. Same deterministic selection
    (_pack_by_counts); only the counter differs."""
    from .bpe import bpe_doc_token_counts

    return _pack_by_counts(bpe_doc_token_counts(docs, merge_rows),
                           budget_tokens)


def dd_pack_bucket_expr() -> str:
    h = dd_h64("'pack#' || doc_id::VARCHAR")
    return f"{h} % {BUDGET_BUCKETS}"


def _dd_pack_selection_sql(budget_tokens: int) -> str:
    """The bucket-threshold selection SQL over a `toks(doc_id, n_tokens,
    bucket)` CTE — the DuckDB twin of :func:`_pack_by_counts`, shared by
    both budget oracles so selection semantics cannot drift between the
    whitespace and tokenizer-token meters."""
    return f"""hist AS (
  SELECT bucket, sum(n_tokens) AS btoks FROM toks GROUP BY bucket
),
cum AS (
  SELECT bucket, sum(btoks) OVER (ORDER BY bucket
    ROWS UNBOUNDED PRECEDING) AS cum FROM hist
),
cutoff AS (
  SELECT max(bucket) AS max_bucket FROM cum WHERE cum <= {budget_tokens}
)
SELECT doc_id, n_tokens, bucket
FROM toks CROSS JOIN cutoff WHERE bucket <= max_bucket""".strip()


def dd_pack_token_budget_sql(budget_tokens: int,
                             table: str = "documents") -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, len({dd_tokenize('text')})::BIGINT AS n_tokens,
         {dd_pack_bucket_expr()} AS bucket
  FROM {table}
),
{_dd_pack_selection_sql(budget_tokens)}
""".strip()


def dd_pack_bpe_token_budget_sql(budget_tokens: int,
                                 table: str = "documents") -> str:
    """Oracle twin of :func:`pack_bpe_token_budget`: per-doc counts from
    the derived merges (operators/bpe.dd_bpe_doc_counts_ctes), then the
    identical bucket-threshold SQL."""
    from .bpe import dd_bpe_doc_counts_ctes

    return f"""
WITH RECURSIVE
{dd_bpe_doc_counts_ctes(table)},
toks AS (
  SELECT doc_id, n_tokens, {dd_pack_bucket_expr()} AS bucket
  FROM bpe_counts
),
{_dd_pack_selection_sql(budget_tokens)}
""".strip()


# --- per-group caps ---------------------------------------------------------


def lang_capped_sample(docs: DataFrame, cap: int) -> DataFrame:
    """At most `cap` documents per language, chosen by deterministic hash
    priority (ties on doc_id) — the balanced-resampling move that bounds
    any one domain/language's share. Window partitions are per-language,
    so no partition exceeds that language's row count; for a pathologically
    dominant group the same cap can ride on a two-level (salted prefix)
    window, but the grouping shape is identical."""
    pri = h64(F.concat(F.lit("cap#"), F.col("doc_id").cast("string")))
    w = Window.partitionBy("lang").orderBy(pri.asc(), F.col("doc_id").asc())
    return (
        docs.select("doc_id", "lang")
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= cap)
        .select("doc_id", "lang", "rn")
    )


def dd_lang_capped_sample_sql(cap: int, table: str = "documents") -> str:
    pri = dd_h64("'cap#' || doc_id::VARCHAR")
    return f"""
SELECT doc_id, lang, rn FROM (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY lang
           ORDER BY {pri} ASC, doc_id ASC)::BIGINT AS rn
  FROM {table}
) WHERE rn <= {cap}
""".strip()


# --- benchmark decontamination ----------------------------------------------

DECON_SHINGLE_N = 4
EVAL_MOD = 100  # deterministic "benchmark" slice: doc_id % EVAL_MOD == 0


def _shingles(df: DataFrame, n: int, distinct: bool = True) -> DataFrame:
    """(doc_id, s): n-token shingles, codegen-friendly (arrays_zip of
    shifted slices, same trick as dedup._doc_shingles). distinct=False
    skips the dedup shuffle for callers that aggregate downstream."""
    spark = df.sparkSession
    toks = df.repartition(spark.sparkContext.defaultParallelism).select(
        "doc_id", tokenize(F.col("text")).alias("t")
    )
    zipped = toks.where(F.size("t") >= n).select(
        "doc_id",
        F.explode(
            F.arrays_zip(*[
                F.expr(f"slice(t, {i + 1}, size(t) - {n - 1})").alias(
                    chr(97 + i)
                )
                for i in range(n)
            ])
        ).alias("z"),
    )
    out = zipped.select(
        "doc_id",
        F.concat_ws(
            " ", *[F.col(f"z.{chr(97 + i)}") for i in range(n)]
        ).alias("s"),
    )
    return out.distinct() if distinct else out


def decontaminate_ngrams(docs: DataFrame) -> DataFrame:
    """Flag training documents sharing any DECON_SHINGLE_N-gram with the
    benchmark slice (doc_id % EVAL_MOD == 0 stands in for an eval set) —
    the standard n-gram decontamination pass before training.

    Shape: the (small) benchmark side dedupes and broadcasts; the TRAIN
    side streams its raw shingles straight into the broadcast equi-join —
    no corpus-wide distinct shuffle, because countDistinct downstream
    dedupes only the matched survivors (bounded by the actual overlap).
    Cost tracks shingle collisions, never |corpus| x |benchmark|.

    Output: doc_id, n_shared_shingles, n_eval_docs_hit (contaminated
    training docs only, benchmark members excluded).
    """
    eval_sh = (
        _shingles(docs.where(F.col("doc_id") % EVAL_MOD == 0),
                  DECON_SHINGLE_N)
        .select(F.col("doc_id").alias("eval_id"), "s")
    )
    train_sh = _shingles(
        docs.where(F.col("doc_id") % EVAL_MOD != 0),
        DECON_SHINGLE_N, distinct=False,
    )
    return (
        train_sh.join(F.broadcast(eval_sh), "s")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("s").alias("n_shared_shingles"),
            F.countDistinct("eval_id").alias("n_eval_docs_hit"),
        )
        .orderBy("doc_id")
    )


def dd_decontaminate_ngrams_sql(table: str = "documents") -> str:
    n = DECON_SHINGLE_N
    toks = dd_tokenize("text")
    return f"""
WITH toks AS (SELECT doc_id, {toks} AS t FROM {table}),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(t) - {n} + 2),
           i -> array_to_string(list_slice(t, i, i + {n} - 1), ' '))) AS s
  FROM toks WHERE len(t) >= {n}
),
eval_sh AS (
  SELECT doc_id AS eval_id, s FROM sh WHERE doc_id % {EVAL_MOD} = 0
),
train_sh AS (SELECT doc_id, s FROM sh WHERE doc_id % {EVAL_MOD} <> 0)
SELECT t.doc_id, count(DISTINCT t.s)::BIGINT AS n_shared_shingles,
       count(DISTINCT e.eval_id)::BIGINT AS n_eval_docs_hit
FROM train_sh t JOIN eval_sh e ON t.s = e.s
GROUP BY t.doc_id ORDER BY t.doc_id
""".strip()


# --- sequence packing (context-window binning) -------------------------------

CONTEXT_TOKENS = 2_048


def pack_sequences(docs: DataFrame, context_tokens: int = CONTEXT_TOKENS,
                   group_col: str = "lang") -> DataFrame:
    """Assign documents to fixed-size context windows (training "sample
    packing"): within each group, next-fit binning in deterministic hash
    order — a new bin starts whenever the running token count would
    overflow the context.

    Binning is inherently sequential, so it runs per GROUP inside
    applyInPandas (Arrow-batched, one shuffle on the group key) — each
    group's stream is processed independently in parallel, the per-group
    state is two integers, and no global order exists anywhere. Documents
    longer than the context get a bin of their own (truncation is the
    tokenizer's job, not the packer's). Deterministic: hash order with
    doc_id ties, so re-runs and the equality tests get identical bins.

    Output: doc_id, group, bin_id (dense per group), n_tokens, bin_tokens
    (the bin's running total after this doc).
    """
    import pandas as pd

    toks = docs.select(
        F.col("doc_id"),
        F.col(group_col).alias("group"),
        F.size(tokenize(F.col("text"))).cast("long").alias("n_tokens"),
        F.pmod(
            h64(F.concat(F.lit("seq#"), F.col("doc_id").cast("string"))),
            F.lit(1 << 32),
        ).alias("pri"),
    )

    def pack_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["pri", "doc_id"], kind="stable")
        bins, fills = [], []
        bin_id, fill = 0, 0
        for n in pdf["n_tokens"]:
            n = int(n)
            if fill > 0 and fill + n > context_tokens:
                bin_id, fill = bin_id + 1, 0
            fill += n
            bins.append(bin_id)
            fills.append(fill)
        out = pdf[["doc_id", "group", "n_tokens"]].copy()
        out["bin_id"] = bins
        out["bin_tokens"] = fills
        return out[["doc_id", "group", "bin_id", "n_tokens", "bin_tokens"]]

    return toks.groupBy("group").applyInPandas(
        pack_group,
        "doc_id long, group string, bin_id long, n_tokens long, "
        "bin_tokens long",
    )


def dd_pack_sequences_sql(table: str = "documents",
                          context_tokens: int = CONTEXT_TOKENS,
                          group_col: str = "lang") -> str:
    """Recursive-CTE twin of pack_sequences: next-fit binning is exact
    integer arithmetic over a deterministic (pri, doc_id) order, so the
    sequential fold is SQL-expressible — the recursion steps through
    each group's rows by row_number, carrying (bin_id, fill), exactly
    the two integers the applyInPandas body carries."""
    from ..functions.hashing import dd_h64
    from ..functions.text import dd_tokenize

    pri = dd_h64("'seq#' || doc_id::VARCHAR")
    toks = dd_tokenize("text")
    return f"""
WITH RECURSIVE rows_o AS (
  SELECT doc_id, {group_col} AS grp,
         len({toks})::BIGINT AS n_tokens,
         ({pri} % {1 << 32}) AS pri,
         row_number() OVER (
           PARTITION BY {group_col}
           ORDER BY ({pri} % {1 << 32}) ASC, doc_id ASC) AS rn
  FROM {table}
),
rec(rn, grp, doc_id, n_tokens, bin_id, fill) AS (
  SELECT rn, grp, doc_id, n_tokens, 0::BIGINT, n_tokens
  FROM rows_o WHERE rn = 1
  UNION ALL
  SELECT r.rn, r.grp, r.doc_id, r.n_tokens,
         CASE WHEN p.fill > 0 AND p.fill + r.n_tokens > {context_tokens}
              THEN p.bin_id + 1 ELSE p.bin_id END,
         CASE WHEN p.fill > 0 AND p.fill + r.n_tokens > {context_tokens}
              THEN r.n_tokens ELSE p.fill + r.n_tokens END
  FROM rows_o r JOIN rec p ON r.grp = p.grp AND r.rn = p.rn + 1
)
SELECT doc_id, grp AS "group", bin_id, n_tokens, fill AS bin_tokens
FROM rec
""".strip()

