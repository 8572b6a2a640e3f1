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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..config import SCORE_ROUND
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


MIXTURE_TAU = 2.0            # temperature: share ∝ tokens^(1/τ)
MIXTURE_BUDGET = 10_000_000  # target training tokens for epoch math


def mixture_weights(docs: DataFrame) -> DataFrame:
    """Temperature-scaled sampling mixture over (source, lang) buckets —
    the computation behind every multi-source pretraining data recipe
    (upweight small high-value sources, damp the dominant crawl): natural
    token share, tokens^(1/tau) renormalized into the sampling share, and
    the epochs each bucket repeats to fill MIXTURE_BUDGET at that share.

    One token-count aggregate over the corpus, then two 1-row broadcast
    totals — per-bucket math is pure codegen arithmetic, so the whole
    recipe costs one scan regardless of corpus size.
    """
    from ..functions.text import tokenize

    buckets = (
        docs.select(
            "source", "lang",
            F.size(tokenize(F.col("text"))).cast("long").alias("n_tok"),
        )
        .groupBy("source", "lang")
        .agg(F.sum("n_tok").alias("tokens"))
    )
    tot = buckets.agg(
        F.sum("tokens").alias("total_tokens"),
        F.sum(F.pow(F.col("tokens"), F.lit(1.0 / MIXTURE_TAU))).alias(
            "total_scaled"
        ),
    )
    return (
        buckets.crossJoin(F.broadcast(tot))
        .select(
            "source", "lang", "tokens",
            F.round(F.col("tokens") / F.col("total_tokens"), 6).alias(
                "natural_share"
            ),
            F.round(
                F.pow(F.col("tokens"), F.lit(1.0 / MIXTURE_TAU))
                / F.col("total_scaled"),
                6,
            ).alias("mixture_share"),
            F.round(
                F.pow(F.col("tokens"), F.lit(1.0 / MIXTURE_TAU))
                / F.col("total_scaled")
                * F.lit(float(MIXTURE_BUDGET))
                / F.col("tokens"),
                6,
            ).alias("epochs"),
        )
        .orderBy("source", "lang")
    )


def dd_mixture_weights_sql(table: str = "documents") -> str:
    from ..functions.text import dd_tokenize

    toks = dd_tokenize("text")
    inv_tau = 1.0 / MIXTURE_TAU
    return f"""
WITH buckets AS (
  SELECT source, lang, sum(len({toks}))::BIGINT AS tokens
  FROM {table} GROUP BY source, lang
),
tot AS (
  SELECT sum(tokens) * 1.0 AS total_tokens,
         sum(pow(tokens, {inv_tau})) AS total_scaled
  FROM buckets
)
SELECT source, lang, tokens,
       round(tokens / total_tokens, 6) AS natural_share,
       round(pow(tokens, {inv_tau}) / total_scaled, 6) AS mixture_share,
       round(pow(tokens, {inv_tau}) / total_scaled
             * {float(MIXTURE_BUDGET)} / tokens, 6) AS epochs
FROM buckets CROSS JOIN tot
ORDER BY source, lang
""".strip()


# --- train/val/test split ----------------------------------------------------

SPLIT_TRAIN_PCT = 80
SPLIT_VAL_PCT = 10  # val = [80, 90), test = [90, 100)


def train_val_test_split(docs: DataFrame) -> DataFrame:
    """Deterministic 80/10/10 corpus split by content-independent id
    hash (h64(doc_id) % 100) with per-split statistics — the assignment
    every training pipeline needs to be REPRODUCIBLE across engines,
    re-runs, and re-partitions (no sample(), no RNG, no order
    dependence; a document's split follows it forever).

    One projection + one hash aggregate; the split column itself is a
    pure expression, so downstream consumers filter on it and the
    predicate reaches the scan."""
    from ..functions.hashing import h64

    bucket = h64(F.col("doc_id").cast("string")) % 100
    split = (
        F.when(bucket < SPLIT_TRAIN_PCT, "train")
        .when(bucket < SPLIT_TRAIN_PCT + SPLIT_VAL_PCT, "val")
        .otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "n_chars", "lang")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.countDistinct("lang").alias("n_langs"),
        )
        .orderBy("split")
    )


def dd_train_val_test_split_sql(table: str = "documents") -> str:
    from ..functions.hashing import dd_h64

    h = dd_h64("doc_id::VARCHAR")
    return f"""
WITH assigned AS (
  SELECT CASE WHEN {h} % 100 < {SPLIT_TRAIN_PCT} THEN 'train'
              WHEN {h} % 100 < {SPLIT_TRAIN_PCT + SPLIT_VAL_PCT} THEN 'val'
              ELSE 'test' END AS split,
         n_chars, lang
  FROM {table}
)
SELECT split, count(*)::BIGINT AS n_docs,
       sum(n_chars)::BIGINT AS sum_chars,
       count(DISTINCT lang)::BIGINT AS n_langs
FROM assigned GROUP BY split ORDER BY split
""".strip()


# --- corpus_benchmark_contamination ------------------------------------------

CONTAM_N = 8          # word 8-grams — the standard decontamination unit
# doc_id % 7 == 0 -> the in-plan "benchmark" set (~14% of docs; chosen so
# the synthetic corpus' near-dup pairs actually straddle the split and the
# report has nonzero signal at test scale — 9 contaminated docs at sf0.01)
CONTAM_BENCH_MOD = 7
CONTAM_ROUND = 6


def benchmark_contamination(docs: DataFrame) -> DataFrame:
    """Train-set decontamination report: which training documents share a
    word 8-gram with the evaluation benchmark, per source. The per-SOURCE
    dashboard complement of packing.decontaminate_ngrams (which emits the
    per-doc contaminated list): this one reports every source's rate,
    including clean sources (left join), plus the worst per-doc overlap.

    The benchmark set is derived in-plan (doc_id % CONTAM_BENCH_MOD == 0)
    so the query is deterministic and oracle-checkable; in production it
    is the eval suites' text. Scale shape: the benchmark's distinct
    shingle set is benchmark-sized (eval suites are tiny next to a 100 TB
    corpus) and BROADCAST; per-doc shingle dedup happens MAP-SIDE
    (array_distinct before the explode — never a corpus-wide distinct
    shuffle), so the train side is one tokenize/shingle pass + a
    broadcast semi-probe + a per-doc aggregate over only the matched
    survivors. The only corpus-keyed shuffles are the per-doc overlap
    aggregate (bounded by actual matches) and the final per-source
    rollup. The repartition exists for input-split parallelism at test
    scale (one small parquet file = one split); cluster-scale inputs
    already arrive split.

    Output per source: n_train, n_contaminated, contamination_rate,
    max_overlap (worst per-doc count of overlapping benchmark 8-grams).
    """
    from ..functions.text import shingles, tokenize

    spark = docs.sparkSession
    is_bench = F.col("doc_id") % CONTAM_BENCH_MOD == 0
    sh = (
        docs.repartition(spark.sparkContext.defaultParallelism)
        .select("doc_id", tokenize(F.col("text")).alias("t"))
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(shingles(F.col("t"), CONTAM_N))
            ).alias("s"),
        )
    )
    bench_sh = sh.where(is_bench).select("s").distinct()
    overlap = (
        sh.where(~is_bench)
        .join(F.broadcast(bench_sh), "s")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap"))
    )
    train = docs.where(~is_bench).select("doc_id", "source")
    per_doc = train.join(overlap, "doc_id", "left")
    contaminated = F.when(F.col("n_overlap").isNotNull(), 1).otherwise(0)
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_train"),
            F.sum(contaminated).cast("long").alias("n_contaminated"),
            F.round(
                F.sum(contaminated) / F.count(F.lit(1)), CONTAM_ROUND
            ).alias("contamination_rate"),
            F.max(F.coalesce(F.col("n_overlap"), F.lit(0)))
            .cast("long").alias("max_overlap"),
        )
        .orderBy("source")
    )


def dd_benchmark_contamination_sql(table: str = "documents") -> str:
    from ..functions.text import dd_shingles, dd_tokenize

    toks = dd_tokenize("text")
    return f"""
WITH toks AS (SELECT doc_id, {toks} AS t FROM {table}),
sh AS (
  SELECT DISTINCT doc_id, unnest({dd_shingles('t', CONTAM_N)}) AS s
  FROM toks
),
bench AS (
  SELECT DISTINCT s FROM sh WHERE doc_id % {CONTAM_BENCH_MOD} = 0
),
overlap AS (
  SELECT doc_id, count(*)::BIGINT AS n_overlap
  FROM sh
  WHERE doc_id % {CONTAM_BENCH_MOD} <> 0
    AND s IN (SELECT s FROM bench)
  GROUP BY doc_id
),
train AS (
  SELECT doc_id, source FROM {table}
  WHERE doc_id % {CONTAM_BENCH_MOD} <> 0
)
SELECT source, count(*)::BIGINT AS n_train,
       sum(CASE WHEN o.n_overlap IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
         AS n_contaminated,
       round(sum(CASE WHEN o.n_overlap IS NOT NULL THEN 1 ELSE 0 END)
             / count(*), {CONTAM_ROUND}) AS contamination_rate,
       max(coalesce(o.n_overlap, 0))::BIGINT AS max_overlap
FROM train t LEFT JOIN overlap o USING (doc_id)
GROUP BY source ORDER BY source
""".strip()


# --- corpus_ngram_novelty -----------------------------------------------------

NOVELTY_N = 8


def ngram_novelty_by_source(docs: DataFrame) -> DataFrame:
    """Novelty scoring: per source, how much of each document's content
    is FIRST-OCCURRENCE text (word 8-grams whose minimum owning doc_id is
    the document itself) — the dedup-adjacent diagnostic separating
    sources that contribute new text from sources that re-serve it.

    Scale shape: NO shingle-keyed big-big join. The per-shingle min-owner
    aggregate (one linear shuffle) IS the novel-count table — each
    shingle credits exactly its first owner — so per-doc novelty needs
    only doc-sized joins after two linear aggregates. Per-doc shingle
    dedup is map-side (array_distinct before explode).

    Output per source: n_docs, mean_novelty, n_fully_novel.
    """
    from ..functions.text import shingles, tokenize

    spark = docs.sparkSession
    sh = (
        docs.repartition(spark.sparkContext.defaultParallelism)
        .select("doc_id", tokenize(F.col("text")).alias("t"))
        .select(
            "doc_id",
            F.explode(
                F.array_distinct(shingles(F.col("t"), NOVELTY_N))
            ).alias("s"),
        )
    )
    totals = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    owners = sh.groupBy("s").agg(F.min("doc_id").alias("first_doc"))
    novel = owners.groupBy(F.col("first_doc").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("n_novel")
    )
    per_doc = (
        totals.join(novel, "doc_id", "left")
        .select(
            "doc_id",
            (F.coalesce(F.col("n_novel"), F.lit(0)) / F.col("n_shingles"))
            .alias("novelty"),
        )
    )
    return (
        docs.select("doc_id", "source")
        .join(per_doc, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("novelty"), 6).alias("mean_novelty"),
            F.sum(F.when(F.col("novelty") == 1.0, 1).otherwise(0))
            .cast("long").alias("n_fully_novel"),
        )
        .orderBy("source")
    )


def dd_ngram_novelty_sql(table: str = "documents") -> str:
    from ..functions.text import dd_shingles, dd_tokenize

    toks = dd_tokenize("text")
    return f"""
WITH toks AS (SELECT doc_id, {toks} AS t FROM {table}),
sh AS (
  SELECT DISTINCT doc_id, unnest({dd_shingles('t', NOVELTY_N)}) AS s
  FROM toks
),
totals AS (
  SELECT doc_id, count(*)::BIGINT AS n_shingles FROM sh GROUP BY doc_id
),
owners AS (SELECT s, min(doc_id) AS first_doc FROM sh GROUP BY s),
novel AS (
  SELECT first_doc AS doc_id, count(*)::BIGINT AS n_novel
  FROM owners GROUP BY first_doc
),
per_doc AS (
  SELECT t.doc_id,
         coalesce(n.n_novel, 0) * 1.0 / t.n_shingles AS novelty
  FROM totals t LEFT JOIN novel n USING (doc_id)
)
SELECT d.source, count(*)::BIGINT AS n_docs,
       round(avg(p.novelty), 6) AS mean_novelty,
       sum(CASE WHEN p.novelty = 1.0 THEN 1 ELSE 0 END)::BIGINT
         AS n_fully_novel
FROM {table} d JOIN per_doc p USING (doc_id)
GROUP BY d.source ORDER BY d.source
""".strip()


# --- DSIR importance resampling weights --------------------------------------


DSIR_BUCKETS = 1024
DSIR_TARGET_LANG = "en"


def dsir_importance_weights(docs: DataFrame,
                            target_lang: str = DSIR_TARGET_LANG,
                            b: int = DSIR_BUCKETS) -> DataFrame:
    """DSIR (Xie et al. 2023, "Data Selection for Language Models via
    Importance Resampling", arXiv:2302.03169): score every raw document
    by how much it looks like a TARGET distribution, under hashed
    bag-of-n-gram language models. Features are word unigrams + bigrams
    hashed into ``b`` buckets; the target model p is fit on the
    target-language slice, the raw model q on the whole corpus; a doc's
    log importance weight is sum_f count_f * (ln p_f - ln q_f) with
    Laplace smoothing. Downstream pipelines resample by these weights —
    here the weights themselves are the recorded output.

    Scale shape (r14): TWO token/bigram explode passes instead of four —
    the model is ONE b-key aggregate carrying both counters (cq and the
    target-slice cp as a conditional sum; the pre-r14 form ran the
    explode subtree separately for the raw model, the target model and
    the totals), and the totals row derives from the b-row model table
    instead of another corpus pass. Every aggregate over the exploded
    features keys on the b-bounded bucket id or (doc_id, bkt), so
    map-side partial aggregation collapses the shuffle regardless of
    corpus size (measured: chaining the model off the per-doc counts
    instead re-materializes the doc x bkt exchange and LOSES — the
    explode recompute is the cheaper side). Counts are integers, so
    cp/cq/tp/tq — and therefore every log-ratio — are value-identical
    to the multi-pass form. No all-pairs, no driver state.

    Output per doc: doc_id, lang, n_feats, log_importance (round 6).
    """
    from ..functions.spread import spread
    from ..functions.text import tokenize

    # spread: the tokenize+explode+md5 chain is the critical path and a
    # single-file scan would run it on one core (r15 measured; no-op at
    # cluster scale where the source's splits provide the parallelism)
    toks = spread(docs.select("doc_id", "lang", "text")).select(
        "doc_id", "lang", tokenize(F.col("text")).alias("t"))
    uni = F.when(
        F.size("t") >= 1, F.col("t")
    ).otherwise(F.array().cast("array<string>"))
    bi = F.when(
        F.size("t") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("t") - 1),
            lambda i: F.array_join(F.slice("t", i, 2), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = toks.select(
        "doc_id", "lang", F.explode(F.concat(uni, bi)).alias("g")
    )
    bkt = feats.select(
        "doc_id", "lang", (h64(F.col("g")) % b).alias("bkt")
    )
    model = bkt.groupBy("bkt").agg(
        F.count(F.lit(1)).alias("cq"),
        F.sum(
            F.when(F.col("lang") == target_lang, 1).otherwise(0)
        ).alias("cp"),
    )
    # r15: tq/tp as a global window over the b-row model table — the
    # pre-r15 `model.agg(...)` crossJoin re-derived the model from the
    # corpus (a THIRD tokenize+explode pass: the lr branch carries an
    # isnotnull(bkt) constraint inferred from the dbkt join, so
    # ReuseExchange never matched the two model subtrees). The window is
    # bounded by b (1024 rows on one partition), and the integer sums
    # are value-identical to the separate aggregate.
    wall = Window.partitionBy()
    lr = model.select(
        "bkt",
        F.round(
            F.log((F.col("cp") + F.lit(1.0))
                  / (F.sum("cp").over(wall) + F.lit(b)))
            - F.log((F.col("cq") + F.lit(1.0))
                    / (F.sum("cq").over(wall) + F.lit(b))),
            SCORE_ROUND,
        ).alias("lw"),
    )
    dbkt = bkt.groupBy("doc_id", "bkt").agg(F.count(F.lit(1)).alias("c"))
    perdoc = (
        dbkt.join(F.broadcast(lr), "bkt")
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_feats"),
            F.round(F.sum(F.col("c") * F.col("lw")), SCORE_ROUND)
            .alias("log_importance"),
        )
    )
    return (
        docs.select("doc_id", "lang")
        .join(perdoc, "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            F.coalesce(F.col("n_feats"), F.lit(0)).cast("long")
            .alias("n_feats"),
            F.coalesce(F.col("log_importance"), F.lit(0.0))
            .alias("log_importance"),
        )
        .orderBy("doc_id")
    )


def dd_dsir_importance_weights_sql(table: str = "documents",
                                   target_lang: str = DSIR_TARGET_LANG,
                                   b: int = DSIR_BUCKETS) -> str:
    from ..functions.text import dd_tokenize

    toks = dd_tokenize("text")
    return f"""
WITH toks AS (
  SELECT doc_id, lang, {toks} AS t FROM {table}
),
feats AS (
  SELECT doc_id, lang, unnest(
    (CASE WHEN len(t) >= 1 THEN t ELSE [] END) ||
    (CASE WHEN len(t) >= 2 THEN
       list_transform(range(1, len(t)),
                      i -> array_to_string(list_slice(t, i, i + 1), ' '))
     ELSE [] END)
  ) AS g
  FROM toks
),
bkt AS (
  SELECT doc_id, lang, {dd_h64('g')} % {b} AS bkt FROM feats
),
rawc AS (SELECT bkt, count(*)::BIGINT AS cq FROM bkt GROUP BY bkt),
tgtc AS (
  SELECT bkt, count(*)::BIGINT AS cp FROM bkt
  WHERE lang = '{target_lang}' GROUP BY bkt
),
tot AS (
  SELECT count(*)::BIGINT AS tq,
         sum(CASE WHEN lang = '{target_lang}' THEN 1 ELSE 0 END)::BIGINT
           AS tp
  FROM bkt
),
lr AS (
  SELECT r.bkt,
         round(ln((coalesce(c.cp, 0) + 1.0) / (t.tp + {b}))
               - ln((r.cq + 1.0) / (t.tq + {b})), {SCORE_ROUND}) AS lw
  FROM rawc r LEFT JOIN tgtc c ON r.bkt = c.bkt CROSS JOIN tot t
),
dbkt AS (
  SELECT doc_id, bkt, count(*)::BIGINT AS c FROM bkt GROUP BY doc_id, bkt
),
perdoc AS (
  SELECT d.doc_id, sum(d.c)::BIGINT AS n_feats,
         round(sum(d.c * l.lw), {SCORE_ROUND}) AS log_importance
  FROM dbkt d JOIN lr l ON d.bkt = l.bkt GROUP BY d.doc_id
)
SELECT t.doc_id, t.lang,
       coalesce(p.n_feats, 0)::BIGINT AS n_feats,
       coalesce(p.log_importance, 0.0) AS log_importance
FROM {table} t LEFT JOIN perdoc p ON t.doc_id = p.doc_id
ORDER BY t.doc_id
""".strip()


DSIR_SAMPLE_K = 100
DSIR_U_GRID = 1_000_000


def dsir_gumbel_sample(docs: DataFrame, k: int = DSIR_SAMPLE_K,
                       target_lang: str = DSIR_TARGET_LANG,
                       b: int = DSIR_BUCKETS) -> DataFrame:
    """The resampling half of DSIR: draw ``k`` documents WITHOUT
    replacement with probability proportional to exp(log_importance),
    via the Gumbel-top-k trick (Kool et al. 2019, arXiv:1903.06059) —
    argtop-k of log_w + Gumbel noise IS such a sample. The noise is
    DETERMINISTIC (hash-uniform u on a half-open midpoint grid,
    g = -ln(-ln(u))), so the draw is reproducible across engines and
    runs — the property a 100 TB pipeline needs to resume or re-shard
    without reshuffling its training set.

    Scale shape: the score is a map-side expression over the weights
    pass; the top-k is Spark's TakeOrderedAndProject (per-partition
    top-k, driver merges k x partitions rows) — no global sort.

    Output: the k selected docs — doc_id, lang, log_importance,
    sample_score; ties at round-6 broken by doc_id.
    """
    w = dsir_importance_weights(docs, target_lang, b)
    u = (
        F.pmod(
            h64(F.concat(F.lit("gumbel#"), F.col("doc_id").cast("string"))),
            F.lit(DSIR_U_GRID),
        )
        + F.lit(0.5)
    ) / F.lit(float(DSIR_U_GRID))
    gumbel = -F.log(-F.log(u))
    return (
        w.select(
            "doc_id",
            "lang",
            "log_importance",
            F.round(F.col("log_importance") + gumbel, SCORE_ROUND)
            .alias("sample_score"),
        )
        .orderBy(F.desc("sample_score"), F.asc("doc_id"))
        .limit(k)
    )


def dd_dsir_gumbel_sample_sql(table: str = "documents",
                              k: int = DSIR_SAMPLE_K,
                              target_lang: str = DSIR_TARGET_LANG,
                              b: int = DSIR_BUCKETS) -> str:
    weights = dd_dsir_importance_weights_sql(table, target_lang, b)
    gh = dd_h64("'gumbel#' || doc_id::VARCHAR")
    u = f"(({gh} % {DSIR_U_GRID}) + 0.5) / {float(DSIR_U_GRID)}"
    return f"""
WITH w AS ({weights})
SELECT doc_id, lang, log_importance,
       round(log_importance + (-ln(-ln({u}))), {SCORE_ROUND})
         AS sample_score
FROM w
ORDER BY sample_score DESC, doc_id ASC
LIMIT {k}
""".strip()


# --- leakage-safe splits ------------------------------------------------------


def leakage_safe_split(docs: DataFrame) -> DataFrame:
    """Group-aware train/val/test assignment: the unit of splitting is
    the NEAR-DUPLICATE CLUSTER (connected components over the minhash-
    LSH candidate graph), not the document — so a near-dup pair can
    never straddle train and test, the contamination-by-split leak that
    silently inflates every eval built from the same corpus
    (train_val_test_split's per-doc hash rule cannot prevent it). Docs
    in no near-dup pair form singleton clusters keyed by their own id.

    Shape: one LEFT join of the corpus id projection against the
    component table (pair-graph-sized — orders of magnitude smaller
    than the corpus under LSH), then a pure hash expression; the split
    column follows the cluster forever (deterministic across engines,
    re-runs, re-partitions).

    Output: (doc_id, cluster_id, split) at per-doc grain.
    """
    comp = dedup.dedup_components(docs)
    base = docs.select("doc_id").join(comp, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("component_id"), F.col("doc_id"))
        .cast("long").alias("cluster_id"),
    )
    bucket = h64(
        F.concat(F.lit("lsplit#"), F.col("cluster_id").cast("string"))
    ) % 100
    split = (
        F.when(bucket < SPLIT_TRAIN_PCT, "train")
        .when(bucket < SPLIT_TRAIN_PCT + SPLIT_VAL_PCT, "val")
        .otherwise("test")
    )
    return base.select("doc_id", "cluster_id", split.alias("split"))


def dd_leakage_safe_split_sql(table: str = "documents") -> str:
    bucket = dd_h64("'lsplit#' || cluster_id::VARCHAR")
    return f"""
WITH comp AS ({dedup.dd_dedup_components_sql(table)}),
base AS (
  SELECT d.doc_id,
         coalesce(c.component_id, d.doc_id)::BIGINT AS cluster_id
  FROM {table} d LEFT JOIN comp c USING (doc_id)
)
SELECT doc_id, cluster_id,
       CASE WHEN ({bucket} % 100) < {SPLIT_TRAIN_PCT} THEN 'train'
            WHEN ({bucket} % 100) < {SPLIT_TRAIN_PCT + SPLIT_VAL_PCT}
              THEN 'val'
            ELSE 'test' END AS split
FROM base
""".strip()
