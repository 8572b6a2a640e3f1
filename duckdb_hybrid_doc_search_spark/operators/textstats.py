"""Corpus text-analytics operators (pipeline north-star: language-ID,
quality scoring, token counting, fingerprinting, term statistics).

All pure Spark SQL expressions — no Python in the data path — with paired
DuckDB oracle SQL. Built from the same parts as the search engine's FTS
index (tokenize -> explode -> groupBy), so at 100 TB these share scan and
shuffle structure with index construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import SCORE_ROUND
from ..functions.spread import spread
from ..functions.text import dd_tokenize, tokenize

# Marker stopwords per language for the n-gram-free language-ID heuristic.
# Deterministic, tiny, broadcast as literals into the plan.
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein"],
    "en": ["the", "a", "of", "and", "is", "to", "in"],
    "es": ["el", "la", "de", "que", "y", "es", "un"],
    "fr": ["le", "la", "de", "et", "est", "un", "une"],
}

STOPWORDS = sorted({w for ws in LANG_MARKERS.values() for w in ws})

# quality score weights: token diversity, length saturation, alnum ratio
QW_DIVERSITY = 0.4
QW_LENGTH = 0.3
QW_ALNUM = 0.3
QLEN_SATURATION = 100.0  # n_tokens at which the length component saturates


def token_stats(docs: DataFrame) -> DataFrame:
    """Per-doc token counting: whitespace-ish tokens, distinct tokens,
    average token length, and a BPE-ish subword estimate (chars/4)."""
    docs = spread(docs)  # scan-CPU-bound projection (r14: 2.0x measured)
    toks = tokenize(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.round(
            F.aggregate(
                toks, F.lit(0.0), lambda acc, t: acc + F.length(t)
            )
            / F.size(toks),
            SCORE_ROUND,
        ).alias("avg_token_len"),
        F.ceil(F.length("text") / F.lit(4.0)).cast("long").alias("est_bpe_tokens"),
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """Composite quality score in [0,1]:
    diversity (distinct/total tokens) * 0.4
    + min(1, n_tokens/100) * 0.3
    + alnum-char ratio * 0.3, plus a stopword ratio column."""
    docs = spread(docs)  # scan-CPU-bound projection (r14: 2.0x measured)
    # EXACT integer arithmetic end-to-end: with d=|distinct|, n=|tokens|,
    # a=|alnum chars|, L=|chars|, the score is the rational
    #   (400*d*L + 3*min(n,100)*n*L + 300*a*n) / (1000*n*L)
    # and round-half-up to 6 dp is the integer division
    #   (2e6*num + den) div (2*den).
    # Doubles are only used for the final /1e6 (exact same double both
    # engines). Found at sf0.1: a doc whose true score is EXACTLY
    # 0.5844375 — Spark (half-up on shortest double repr) and DuckDB
    # (round on the binary double) disagreed on the last digit.
    toks = tokenize(F.col("text"))
    n = F.size(toks).cast("long")
    d = F.size(F.array_distinct(toks)).cast("long")
    a = F.length(
        F.regexp_replace(F.lower("text"), "[^a-z0-9]", "")
    ).cast("long")
    ln = F.length("text").cast("long")
    k = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS))).cast("long")
    base = docs.select(
        "doc_id",
        (
            F.lit(400) * d * ln
            + F.lit(3) * F.least(n, F.lit(100).cast("long")) * n * ln
            + F.lit(300) * a * n
        ).alias("q_num"),
        (F.lit(1000) * n * ln).alias("q_den"),
        k.alias("k"),
        n.alias("n"),
    )
    return base.select(
        "doc_id",
        # exact integer division, widened to DECIMAL(38,0): 2e6 * q_num
        # would overflow int64 for multi-MB documents (q_num ~ 400*d*L);
        # a double floor() would lose bits past 2^53
        (
            F.expr(
                "(CAST(2000000 AS DECIMAL(38,0)) * q_num + q_den) "
                "div (CAST(2 AS DECIMAL(38,0)) * q_den)"
            )
            / F.lit(1_000_000.0)
        ).alias("quality"),
        (
            F.expr(
                "(CAST(2000000 AS DECIMAL(38,0)) * k + n) "
                "div (CAST(2 AS DECIMAL(38,0)) * n)"
            )
            / F.lit(1_000_000.0)
        ).alias("stopword_ratio"),
    )


def language_id(docs: DataFrame) -> DataFrame:
    """Marker-stopword-voting language ID: score per language = fraction of
    tokens in that language's marker list; argmax, alphabetical tiebreak."""
    docs = spread(docs)  # scan-CPU-bound projection (r14: 3.6x measured)
    toks = tokenize(F.col("text"))
    n = F.size(toks)
    scored = docs.select(
        "doc_id",
        *[
            F.round(
                F.size(F.filter(toks, lambda t: t.isin(ws))) / n, SCORE_ROUND
            ).alias(f"score_{lang}")
            for lang, ws in sorted(LANG_MARKERS.items())
        ],
    )
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{lg}") for lg in langs])
    pred = F.coalesce(
        *[F.when(F.col(f"score_{lg}") == best, F.lit(lg)) for lg in langs]
    )
    return scored.select(
        "doc_id",
        pred.alias("predicted_lang"),
        best.alias("lang_score"),
        *[f"score_{lg}" for lg in langs],
    )


def doc_fingerprints(docs: DataFrame) -> DataFrame:
    """Normalized content fingerprint: md5 over the token stream (so
    whitespace/punctuation variations collapse — unlike dedup_exact's
    raw-text fingerprint)."""
    return docs.select(
        "doc_id",
        F.md5(F.array_join(tokenize(F.col("text")), " ")).alias("fingerprint"),
    )


def term_frequencies(docs: DataFrame, top_n: int = 50) -> DataFrame:
    """Global top-N terms: corpus analytics from the postings layout."""
    return (
        docs.select(F.explode(tokenize(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("term"))
        .limit(top_n)
    )


# --- DuckDB oracle SQL ------------------------------------------------------


def _dd_toks() -> str:
    return dd_tokenize("text")


def dd_token_stats_sql(table: str = "documents") -> str:
    return f"""
WITH t AS (SELECT doc_id, text, {_dd_toks()} AS toks FROM {table})
SELECT doc_id,
       len(toks)::INT AS n_tokens,
       len(list_distinct(toks))::INT AS n_distinct,
       round(list_sum(list_transform(toks, x -> length(x)::DOUBLE)) / len(toks),
             {SCORE_ROUND}) AS avg_token_len,
       ceil(length(text) / 4.0)::BIGINT AS est_bpe_tokens
FROM t
""".strip()


def dd_quality_scores_sql(table: str = "documents") -> str:
    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    return f"""
WITH t AS (SELECT doc_id, text, {_dd_toks()} AS toks FROM {table}),
ints AS (
  SELECT doc_id,
         len(list_distinct(toks))::BIGINT AS d,
         len(toks)::BIGINT AS n,
         length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g'))::BIGINT AS a,
         length(text)::BIGINT AS ln,
         len(list_filter(toks, x -> x IN ({stop_list})))::BIGINT AS k
  FROM t
),
frac AS (
  SELECT doc_id,
         400 * d * ln + 3 * least(n, 100) * n * ln + 300 * a * n AS q_num,
         1000 * n * ln AS q_den,
         k, n
  FROM ints
)
SELECT doc_id,
       ((2000000::HUGEINT * q_num + q_den) // (2::HUGEINT * q_den))
         / 1000000.0 AS quality,
       ((2000000::HUGEINT * k + n) // (2::HUGEINT * n))
         / 1000000.0 AS stopword_ratio
FROM frac
""".strip()


def dd_language_id_sql(table: str = "documents") -> str:
    langs = sorted(LANG_MARKERS)
    score_cols = ",\n       ".join(
        f"round(len(list_filter(toks, x -> x IN "
        f"({', '.join(repr(w) for w in LANG_MARKERS[lg])}))) * 1.0 / len(toks),"
        f" {SCORE_ROUND}) AS score_{lg}"
        for lg in langs
    )
    best = "greatest(" + ", ".join(f"score_{lg}" for lg in langs) + ")"
    pred = "CASE " + " ".join(
        f"WHEN score_{lg} = {best} THEN '{lg}'" for lg in langs
    ) + " END"
    return f"""
WITH t AS (SELECT doc_id, {_dd_toks()} AS toks FROM {table}),
scored AS (
  SELECT doc_id,
       {score_cols}
  FROM t
)
SELECT doc_id, {pred} AS predicted_lang, {best} AS lang_score,
       {', '.join(f'score_{lg}' for lg in langs)}
FROM scored
""".strip()


def dd_doc_fingerprints_sql(table: str = "documents") -> str:
    return f"""
SELECT doc_id, md5(array_to_string({_dd_toks()}, ' ')) AS fingerprint
FROM {table}
""".strip()


def dd_term_frequencies_sql(top_n: int = 50, table: str = "documents") -> str:
    return f"""
SELECT term, count(*)::BIGINT AS cnt
FROM (SELECT unnest({_dd_toks()}) AS term FROM {table})
GROUP BY term ORDER BY cnt DESC, term ASC LIMIT {top_n}
""".strip()


def unigram_logprob_scores(docs: DataFrame) -> DataFrame:
    """Language-model quality signal: average unigram log-probability of
    each document under the corpus's own unigram distribution (higher =
    more typical text; extreme-low = boilerplate/garbage — a standard
    training-data filter signal).

    Two aggregations over one token explode: corpus term totals (tiny,
    broadcast back), then a per-doc mean of ln(tf_corpus/total). All
    JVM-side arithmetic; the token pass is the same explode the FTS build
    uses."""
    toks = docs.select(
        "doc_id", F.explode(tokenize(F.col("text"))).alias("term")
    )
    term_tot = toks.groupBy("term").agg(F.count(F.lit(1)).alias("ct"))
    total = term_tot.agg(F.sum("ct").alias("total"))
    scored = (
        toks.join(F.broadcast(term_tot), "term")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            (F.log(F.col("ct") / F.col("total"))).alias("lp"),
        )
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.round(F.avg("lp"), SCORE_ROUND).alias("avg_logprob"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
    )


def dd_unigram_logprob_sql(table: str = "documents") -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({_dd_toks()}) AS term FROM {table}
),
term_tot AS (SELECT term, count(*)::BIGINT AS ct FROM toks GROUP BY term),
total AS (SELECT sum(ct)::BIGINT AS total FROM term_tot)
SELECT doc_id, round(avg(ln(ct * 1.0 / total)), {SCORE_ROUND}) AS avg_logprob,
       count(*)::BIGINT AS n_tokens
FROM toks JOIN term_tot USING (term) CROSS JOIN total
GROUP BY doc_id
""".strip()


# --- C4/Gopher-style corpus-cleaning signals (round 2) -----------------------


def repetition_stats(docs: DataFrame) -> DataFrame:
    """C4/Gopher-style within-document repetition signals: line counts,
    duplicate-line count, and the fraction of characters inside duplicated
    lines — the standard boilerplate detector for web-scale corpora. One
    explode + two aggregations, all JVM-side."""
    lines = docs.select(
        "doc_id",
        F.explode(F.split("text", "\n")).alias("line"),
    ).where(F.length(F.trim("line")) > 0)
    per_line = lines.groupBy("doc_id", "line").agg(
        F.count(F.lit(1)).alias("cnt"), F.length("line").alias("chars")
    )
    return (
        per_line.groupBy("doc_id")
        .agg(
            F.sum("cnt").alias("n_lines"),
            F.sum(F.when(F.col("cnt") > 1, F.col("cnt"))).alias("dup_raw"),
            F.sum(F.col("cnt") * F.col("chars")).alias("total_chars"),
            F.sum(
                F.when(F.col("cnt") > 1, F.col("cnt") * F.col("chars"))
            ).alias("dup_chars_raw"),
        )
        .select(
            "doc_id",
            "n_lines",
            F.coalesce(F.col("dup_raw"), F.lit(0)).alias("n_dup_lines"),
            # exact integer half-up division, DECIMAL-widened against
            # int64 overflow (see quality_scores)
            (
                F.expr(
                    "(CAST(2000000 AS DECIMAL(38,0)) "
                    "* coalesce(dup_chars_raw, 0) + total_chars) "
                    "div (CAST(2 AS DECIMAL(38,0)) * total_chars)"
                )
                / F.lit(1_000_000.0)
            ).alias("dup_char_ratio"),
        )
    )


def dd_repetition_stats_sql(table: str = "documents") -> str:
    return f"""
WITH lines AS (
  SELECT doc_id, line FROM (
    SELECT doc_id, unnest(string_split(text, chr(10))) AS line FROM {table}
  ) WHERE length(trim(line)) > 0
),
per_line AS (
  SELECT doc_id, line, count(*)::BIGINT AS cnt,
         length(line)::BIGINT AS chars
  FROM lines GROUP BY doc_id, line
),
agg AS (
  SELECT doc_id,
         sum(cnt)::BIGINT AS n_lines,
         coalesce(sum(CASE WHEN cnt > 1 THEN cnt END), 0)::BIGINT
           AS n_dup_lines,
         sum(cnt * chars)::BIGINT AS total_chars,
         coalesce(sum(CASE WHEN cnt > 1 THEN cnt * chars END), 0)::BIGINT
           AS dup_chars
  FROM per_line GROUP BY doc_id
)
SELECT doc_id, n_lines, n_dup_lines,
       ((2000000::HUGEINT * dup_chars + total_chars)
         // (2::HUGEINT * total_chars)) / 1000000.0 AS dup_char_ratio
FROM agg
""".strip()


def paragraph_dedup(docs: DataFrame) -> DataFrame:
    """Cross-document paragraph-level exact dedup (the sub-document
    granularity real pipelines dedup at — boilerplate paragraphs recur
    across distinct pages). Output: one row per paragraph occurring in
    more than one document: md5, occurrence count, keeper doc."""
    paras = docs.select(
        "doc_id",
        F.explode(F.split("text", "\n\n")).alias("para"),
    ).where(F.length(F.trim("para")) > 0)
    return (
        paras.select("doc_id", F.md5(F.trim("para")).alias("para_md5"))
        .distinct()
        .groupBy("para_md5")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("keep_doc"),
        )
        .where(F.col("n_docs") > 1)
    )


def dd_paragraph_dedup_sql(table: str = "documents") -> str:
    return f"""
WITH paras AS (
  SELECT DISTINCT doc_id, md5(trim(para)) AS para_md5 FROM (
    SELECT doc_id,
           unnest(string_split(text, chr(10) || chr(10))) AS para
    FROM {table}
  ) WHERE length(trim(para)) > 0
)
SELECT para_md5, count(*)::BIGINT AS n_docs, min(doc_id) AS keep_doc
FROM paras GROUP BY para_md5 HAVING count(*) > 1
""".strip()


PII_EMAIL_RE = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
PII_DIGITS_RE = "[0-9]{6,}"


def redact_pii(docs: DataFrame) -> DataFrame:
    """PII scrubbing: redact email addresses and long digit runs (the
    minimum-viable pass every released training corpus runs), with
    per-doc redaction counts. Stateless map — no shuffle at any scale
    (spread is partition-count-conditional: inert once the source's own
    splits provide parallelism; r14: 2.8x measured on the one-file
    test input)."""
    docs = spread(docs)
    emails = F.size(F.regexp_extract_all("text", F.lit(PII_EMAIL_RE)))
    scrubbed1 = F.regexp_replace("text", PII_EMAIL_RE, "<EMAIL>")
    digits = F.size(
        F.regexp_extract_all(scrubbed1, F.lit(PII_DIGITS_RE))
    )
    clean = F.regexp_replace(scrubbed1, PII_DIGITS_RE, "<NUM>")
    return docs.select(
        "doc_id",
        emails.alias("n_emails"),
        digits.alias("n_long_numbers"),
        F.length(clean).alias("clean_len"),
        F.md5(clean).alias("clean_md5"),
    )


def dd_redact_pii_sql(table: str = "documents") -> str:
    em, dg = PII_EMAIL_RE, PII_DIGITS_RE
    return f"""
WITH s1 AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '{em}'))::INT AS n_emails,
         regexp_replace(text, '{em}', '<EMAIL>', 'g') AS t1
  FROM {table}
)
SELECT doc_id, n_emails,
       len(regexp_extract_all(t1, '{dg}'))::INT AS n_long_numbers,
       length(regexp_replace(t1, '{dg}', '<NUM>', 'g'))::INT AS clean_len,
       md5(regexp_replace(t1, '{dg}', '<NUM>', 'g')) AS clean_md5
FROM s1
""".strip()


# --- Count-Min sketch with measured error -----------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 1024
CMS_TOP_N = 20


def countmin_error(docs: DataFrame) -> DataFrame:
    """Count-Min sketch over corpus term frequencies, with its error
    MEASURED against the exact counts for the top-N terms.

    The sketch is depth x width counters built as ONE aggregation per
    depth row (hash terms into slots, sum term frequencies) — a few KB of
    state however large the corpus, the canonical sketch trade. Estimates
    (min over depths of the probed slot) always over-count; rel_err
    records by how much at this width. All hashing is the deterministic
    md5-h64, so the whole metric is oracle-exact — the approximation is a
    recorded number, same discipline as the ANN recall rows.

    Output: term, exact, estimate, rel_err (top-N exact terms).
    """
    from ..functions.hashing import h64
    from ..functions.text import tokenize

    tf = (
        docs.select(F.explode(tokenize(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )

    def slot(d: int, term_col) -> F.Column:
        return F.pmod(
            h64(F.concat(F.lit(f"cms{d}#"), term_col)), F.lit(CMS_WIDTH)
        )

    counters = None
    for d in range(CMS_DEPTH):
        part = tf.groupBy(slot(d, F.col("term")).alias("slot")).agg(
            F.sum("cnt").alias("c")
        ).select(F.lit(d).alias("depth"), "slot", "c")
        counters = part if counters is None else counters.unionByName(part)

    top = tf.orderBy(F.desc("cnt"), F.asc("term")).limit(CMS_TOP_N)
    probes = None
    for d in range(CMS_DEPTH):
        p = top.select(
            "term", "cnt", F.lit(d).alias("depth"),
            slot(d, F.col("term")).alias("slot"),
        )
        probes = p if probes is None else probes.unionByName(p)
    est = (
        probes.join(counters, ["depth", "slot"])
        .groupBy("term", "cnt")
        .agg(F.min("c").alias("estimate"))
    )
    return est.select(
        "term",
        F.col("cnt").alias("exact"),
        "estimate",
        F.round(
            (F.col("estimate") - F.col("cnt")) / F.col("cnt"), 6
        ).alias("rel_err"),
    ).orderBy(F.desc("exact"), F.asc("term"))


def dd_countmin_error_sql(table: str = "documents") -> str:
    from ..functions.hashing import dd_h64
    from ..functions.text import dd_tokenize

    toks = dd_tokenize("text")
    counter_parts = "\nUNION ALL\n".join(
        f"""SELECT {d} AS depth,
       {dd_h64(f"'cms{d}#' || term")} % {CMS_WIDTH} AS slot,
       sum(cnt)::BIGINT AS c
FROM tf GROUP BY depth, slot"""
        for d in range(CMS_DEPTH)
    )
    probe_parts = "\nUNION ALL\n".join(
        f"""SELECT term, cnt, {d} AS depth,
       {dd_h64(f"'cms{d}#' || term")} % {CMS_WIDTH} AS slot FROM top"""
        for d in range(CMS_DEPTH)
    )
    return f"""
WITH tf AS (
  SELECT term, count(*)::BIGINT AS cnt
  FROM (SELECT unnest({toks}) AS term FROM {table})
  GROUP BY term
),
counters AS (
{counter_parts}
),
top AS (
  SELECT term, cnt FROM tf ORDER BY cnt DESC, term ASC LIMIT {CMS_TOP_N}
),
probes AS (
{probe_parts}
)
SELECT p.term, p.cnt AS exact, min(c.c) AS estimate,
       round((min(c.c) - p.cnt) * 1.0 / p.cnt, 6) AS rel_err
FROM probes p JOIN counters c ON p.depth = c.depth AND p.slot = c.slot
GROUP BY p.term, p.cnt
ORDER BY exact DESC, p.term ASC
""".strip()


def source_mix(docs: DataFrame) -> DataFrame:
    """Corpus accounting per (source, lang): docs, tokens, and each
    cell's token share of the whole corpus — the report every curation
    decision starts from. One groupBy plus a 1-row broadcast total."""
    from ..functions.text import tokenize

    cells = (
        docs.select(
            "source", "lang",
            F.size(tokenize(F.col("text"))).cast("long").alias("n_tokens"),
        )
        .groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("tokens"),
        )
    )
    total = cells.agg(F.sum("tokens").alias("total_tokens"))
    return (
        cells.crossJoin(F.broadcast(total))
        .select(
            "source", "lang", "n_docs", "tokens",
            F.round(F.col("tokens") / F.col("total_tokens"), 6)
            .alias("token_share"),
        )
        .orderBy("source", "lang")
    )


def dd_source_mix_sql(table: str = "documents") -> str:
    from ..functions.text import dd_tokenize

    toks = dd_tokenize("text")
    return f"""
WITH cells AS (
  SELECT source, lang, count(*)::BIGINT AS n_docs,
         sum(len({toks}))::BIGINT AS tokens
  FROM {table} GROUP BY source, lang
),
total AS (SELECT sum(tokens) AS total_tokens FROM cells)
SELECT source, lang, n_docs, tokens,
       round(tokens * 1.0 / total_tokens, 6) AS token_share
FROM cells CROSS JOIN total
ORDER BY source, lang
""".strip()


# --- collocation mining (bigram PMI) ----------------------------------------

PMI_MIN_COUNT = 5
PMI_TOP_N = 20
PMI_ROUND = 6


def bigram_pmi(docs: DataFrame) -> DataFrame:
    """Top collocations by pointwise mutual information over corpus
    bigrams — the phrase-mining signal used for tokenizer vocabulary
    construction and boilerplate detection.

        pmi(x,y) = ln( (c_xy / B) / ((c_x / T) * (c_y / T)) )

    with c_* corpus counts, B total bigrams, T total unigrams; bigrams
    with c_xy < PMI_MIN_COUNT are dropped (PMI's low-count pathology).

    Shape: unigram and bigram counts are map-side-combined groupBys over
    a repartitioned tokenize projection (a single-file local input would
    otherwise tokenize on ONE split — same fix as bm25.tokenize_docs);
    bigrams come from arrays_zip of two slices (array-builder codegen,
    ~10x faster than per-index element_at — measured 7.8s -> 0.8s at
    sf0.1). The x/y joins are key-partitioned hash joins on term — no
    forced broadcast of the (vocabulary-sized) unigram table, so the
    plan survives an unbounded vocabulary. The final top-N sorts only
    the >=MIN_COUNT bigram slice.
    """
    spark = docs.sparkSession
    toked = docs.repartition(spark.sparkContext.defaultParallelism).select(
        tokenize(F.col("text")).alias("toks")
    )
    n = F.size(F.col("toks"))
    big = F.transform(
        F.arrays_zip(
            F.slice(F.col("toks"), 1, n - 1), F.slice(F.col("toks"), 2, n - 1)
        ),
        lambda s: F.concat_ws(" ", s["0"], s["1"]),
    )

    # Pin the two count tables (vocabulary-sized — far smaller than the
    # corpus) so totals and joins REUSE them: Catalyst does not dedupe
    # common subplans, and without the pin this plan tokenizes the
    # corpus five times (measured: 5 parquet scans -> 2)
    uni_counts = (
        toked.select(F.explode(F.col("toks")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    big_all = (
        toked.where(n >= 2)
        .select(F.explode(big).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .localCheckpoint(eager=False)
    )
    big_counts = big_all.where(F.col("c_xy") >= PMI_MIN_COUNT)
    tot_t = uni_counts.agg(F.sum("c").alias("tot_t"))
    # total bigrams = sum over the (unfiltered) bigram counts — derived,
    # not a third corpus pass
    tot_b = big_all.agg(F.sum("c_xy").alias("tot_b"))
    xy = big_counts.select(
        "bigram",
        "c_xy",
        F.split(F.col("bigram"), " ").getItem(0).alias("x"),
        F.split(F.col("bigram"), " ").getItem(1).alias("y"),
    )
    j = (
        xy.join(uni_counts.withColumnRenamed("c", "c_x"),
                xy["x"] == uni_counts["term"])
        .drop("term", "x")
        .join(uni_counts.withColumnRenamed("c", "c_y").alias("u2"),
              F.col("y") == F.col("u2.term"))
        .drop("term", "y")
        .crossJoin(F.broadcast(tot_t))
        .crossJoin(F.broadcast(tot_b))
    )
    pmi = F.log(
        (F.col("c_xy").cast("double") / F.col("tot_b"))
        / (
            (F.col("c_x").cast("double") / F.col("tot_t"))
            * (F.col("c_y").cast("double") / F.col("tot_t"))
        )
    )
    return (
        j.select(
            "bigram", "c_xy", "c_x", "c_y",
            F.round(pmi, PMI_ROUND).alias("pmi"),
        )
        .orderBy(F.desc("pmi"), F.asc("bigram"))
        .limit(PMI_TOP_N)
    )


def dd_bigram_pmi_sql(table: str = "documents") -> str:
    toks = dd_tokenize("text")
    return f"""
WITH toks AS (SELECT {toks} AS t FROM {table}),
uni AS (
  SELECT term, count(*)::BIGINT AS c
  FROM (SELECT unnest(t) AS term FROM toks) GROUP BY term
),
big AS (
  SELECT bigram, count(*)::BIGINT AS c_xy
  FROM (
    SELECT unnest(CASE WHEN len(t) >= 2
             THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
             ELSE [] END) AS bigram
    FROM toks
  ) GROUP BY bigram HAVING count(*) >= {PMI_MIN_COUNT}
),
tot AS (
  SELECT (SELECT sum(c) FROM uni)::BIGINT AS tot_t,
         (SELECT sum(greatest(len(t) - 1, 0)) FROM toks)::BIGINT AS tot_b
)
SELECT b.bigram, b.c_xy, ux.c AS c_x, uy.c AS c_y,
       round(ln((b.c_xy::DOUBLE / tot.tot_b)
                / ((ux.c::DOUBLE / tot.tot_t)
                   * (uy.c::DOUBLE / tot.tot_t))), {PMI_ROUND}) AS pmi
FROM big b
JOIN uni ux ON ux.term = string_split(b.bigram, ' ')[1]
JOIN uni uy ON uy.term = string_split(b.bigram, ' ')[2]
CROSS JOIN tot
ORDER BY pmi DESC, b.bigram ASC LIMIT {PMI_TOP_N}
""".strip()


# --- per-language top terms -------------------------------------------------

TOPTERMS_PER_LANG = 10


def top_terms_per_lang(docs: DataFrame) -> DataFrame:
    """Top-N terms per language (count desc, term asc) — per-group top-N
    over the token explode, the per-slice vocabulary profile.

    Window partitions by lang over the (lang, term) count table — the
    aggregate shrinks the data before the window, so the sort input is
    |lang|×|vocab slice| counts, not raw tokens.
    """
    from pyspark.sql import Window

    counts = (
        docs.select("lang", F.explode(tokenize(F.col("text"))).alias("term"))
        .groupBy("lang", "term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("lang").orderBy(F.desc("c"), F.asc("term"))
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= TOPTERMS_PER_LANG)
        .orderBy("lang", "rnk")
    )


def dd_top_terms_per_lang_sql(table: str = "documents") -> str:
    toks = dd_tokenize("text")
    return f"""
WITH counts AS (
  SELECT lang, term, count(*)::BIGINT AS c
  FROM (SELECT lang, unnest({toks}) AS term FROM {table})
  GROUP BY lang, term
)
SELECT lang, term, c, rnk FROM (
  SELECT lang, term, c,
         row_number() OVER (PARTITION BY lang
                            ORDER BY c DESC, term ASC) AS rnk
  FROM counts
) WHERE rnk <= {TOPTERMS_PER_LANG}
ORDER BY lang, rnk
""".strip()


# --- log2 length histogram --------------------------------------------------


def length_histogram(docs: DataFrame) -> DataFrame:
    """Corpus document-length profile: power-of-two buckets of n_chars
    with count and total chars per bucket — single map-side-combined
    aggregate (the standard long-tail length diagnostic)."""
    bucket = F.floor(F.log2(F.greatest(F.col("n_chars"), F.lit(1)))).cast(
        "long"
    )
    return (
        docs.groupBy(bucket.alias("log2_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.min("n_chars").cast("long").alias("min_chars"),
            F.max("n_chars").cast("long").alias("max_chars"),
        )
        .orderBy("log2_bucket")
    )


def dd_length_histogram_sql(table: str = "documents") -> str:
    return f"""
SELECT floor(log2(greatest(n_chars, 1)))::BIGINT AS log2_bucket,
       count(*)::BIGINT AS n_docs,
       sum(n_chars)::BIGINT AS total_chars,
       min(n_chars)::BIGINT AS min_chars,
       max(n_chars)::BIGINT AS max_chars
FROM {table} GROUP BY log2_bucket ORDER BY log2_bucket
""".strip()


# --- per-source quality dashboard -------------------------------------------


def quality_by_source(docs: DataFrame) -> DataFrame:
    """Per-source data-quality dashboard: mean quality score, stopword
    ratio, PII incidence, and mean length — the slice-level report a
    curation run publishes. One join of the quality table to the source
    projection, then a single grouped aggregate (both sides key on
    doc_id; the aggregate output is ≤|sources| rows)."""
    q = quality_scores(docs)
    pii = (
        F.col("text").rlike(PII_EMAIL_RE)
        | F.col("text").rlike(PII_DIGITS_RE)
    ).cast("long")
    meta = docs.select("doc_id", "source", "n_chars", pii.alias("has_pii"))
    j = meta.join(q, "doc_id")
    return (
        j.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("quality"), SCORE_ROUND).alias("mean_quality"),
            F.round(F.avg("stopword_ratio"), SCORE_ROUND).alias(
                "mean_stopword_ratio"
            ),
            F.sum("has_pii").cast("long").alias("n_pii_docs"),
            F.round(
                F.sum("n_chars").cast("double")
                / F.count(F.lit(1)).cast("double"),
                SCORE_ROUND,
            ).alias("mean_chars"),
        )
        .orderBy("source")
    )


def dd_quality_by_source_sql(table: str = "documents") -> str:
    return f"""
WITH q AS ({dd_quality_scores_sql(table)}),
meta AS (
  SELECT doc_id, source, n_chars,
         (regexp_matches(text, '{PII_EMAIL_RE}')
          OR regexp_matches(text, '{PII_DIGITS_RE}'))::BIGINT AS has_pii
  FROM {table}
)
SELECT m.source, count(*)::BIGINT AS n_docs,
       round(avg(q.quality), {SCORE_ROUND}) AS mean_quality,
       round(avg(q.stopword_ratio), {SCORE_ROUND}) AS mean_stopword_ratio,
       sum(m.has_pii)::BIGINT AS n_pii_docs,
       round(sum(m.n_chars)::DOUBLE / count(*)::DOUBLE, {SCORE_ROUND})
         AS mean_chars
FROM meta m JOIN q USING (doc_id)
GROUP BY m.source ORDER BY m.source
""".strip()


# --- TF-IDF keyword extraction ----------------------------------------------

TFIDF_TOPK = 3
TFIDF_ROUND = 6


def tfidf_topk(docs: DataFrame) -> DataFrame:
    """Per-document keyword extraction: top-K terms by smoothed TF-IDF
    (tf * (ln((N+1)/(df+1)) + 1)), ties broken term-asc.

    Plan shape: one tokenize+explode scan -> (doc_id, term) hash
    aggregate (map-side combined) -> join the vocab-sized df table on
    term (shuffle join — at 100 TB the vocabulary is too big to
    broadcast, and term is already the aggregate key so the exchange is
    reused) -> scalar N broadcast -> per-doc row_number window
    (partition = one document's vocabulary, bounded by doc length).
    """
    from pyspark.sql import Window

    toks = docs.select(
        "doc_id", F.explode(tokenize(F.col("text"))).alias("term")
    )
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.agg(
        F.countDistinct("doc_id").cast("double").alias("n_docs")
    )
    scored = (
        tf.join(df, "term")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "doc_id", "term", "tf",
            F.round(
                F.col("tf")
                * (F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0))
                   + 1.0),
                TFIDF_ROUND,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("score"), F.asc("term")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= TFIDF_TOPK)
        .orderBy("doc_id", "rnk")
    )


def dd_tfidf_topk_sql(table: str = "documents") -> str:
    toks = dd_tokenize("text")
    return f"""
WITH tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf
  FROM (SELECT doc_id, unnest({toks}) AS term FROM {table})
  GROUP BY doc_id, term
),
df AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term),
n AS (SELECT count(DISTINCT doc_id)::DOUBLE AS n_docs FROM {table})
SELECT doc_id, term, tf, score, rnk FROM (
  SELECT tf.doc_id, tf.term, tf.tf,
         round(tf.tf * (ln((n.n_docs + 1.0) / (df.df + 1.0)) + 1.0),
               {TFIDF_ROUND}) AS score,
         row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY round(tf.tf * (ln((n.n_docs + 1.0) / (df.df + 1.0))
                    + 1.0), {TFIDF_ROUND}) DESC, tf.term ASC) AS rnk
  FROM tf JOIN df USING (term) CROSS JOIN n
) WHERE rnk <= {TFIDF_TOPK}
ORDER BY doc_id, rnk
""".strip()


# --- CCNet-style perplexity buckets ------------------------------------------

PPL_BUCKETS = 3  # head / middle / tail


def perplexity_buckets(docs: DataFrame) -> DataFrame:
    """CCNet-style corpus partition: rank documents by their unigram-LM
    average log-probability and split into equal-mass head/middle/tail
    terciles, reporting per-bucket count and quality-signal bounds.

    Composition: unigram_logprob_scores (one token explode, broadcast
    term totals) -> relational.distributed_ntile on (avg_logprob,
    doc_id) — the rank never runs a global single-partition sort — ->
    per-bucket aggregate. The oracle ranks with plain ntile, which is
    bit-identical because the order is total (doc_id tie-break).
    Head docs (bucket 1) are the LOWEST logprob = least typical text:
    CCNet keeps the tail, inspects the head.
    """
    from .relational import distributed_ntile

    scored = unigram_logprob_scores(docs)
    bucketed = distributed_ntile(
        scored, PPL_BUCKETS, ["avg_logprob", "doc_id"]
    )
    return (
        bucketed.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.min("avg_logprob"), SCORE_ROUND).alias("lo"),
            F.round(F.max("avg_logprob"), SCORE_ROUND).alias("hi"),
            F.sum("n_tokens").alias("sum_tokens"),
        )
        .orderBy("bucket")
    )


def dd_perplexity_buckets_sql(table: str = "documents") -> str:
    return f"""
WITH toks AS (
  SELECT doc_id, unnest({_dd_toks()}) AS term FROM {table}
),
term_tot AS (SELECT term, count(*)::BIGINT AS ct FROM toks GROUP BY term),
total AS (SELECT sum(ct)::BIGINT AS total FROM term_tot),
scored AS (
  SELECT doc_id, round(avg(ln(ct * 1.0 / total)), {SCORE_ROUND})
           AS avg_logprob,
         count(*)::BIGINT AS n_tokens
  FROM toks JOIN term_tot USING (term) CROSS JOIN total
  GROUP BY doc_id
),
bucketed AS (
  SELECT *, ntile({PPL_BUCKETS}) OVER (ORDER BY avg_logprob, doc_id)::INT
           AS bucket
  FROM scored
)
SELECT bucket, count(*)::BIGINT AS n_docs,
       round(min(avg_logprob), {SCORE_ROUND}) AS lo,
       round(max(avg_logprob), {SCORE_ROUND}) AS hi,
       sum(n_tokens)::BIGINT AS sum_tokens
FROM bucketed GROUP BY bucket ORDER BY bucket
""".strip()


# --- bigram conditional-LM quality signal ------------------------------------

BIGRAM_LM_ROUND = 6


def bigram_logprob_scores(docs: DataFrame) -> DataFrame:
    """Conditional bigram-LM quality signal: per document the average
    ln P(w_i | w_{i-1}) under the corpus's own add-1-smoothed bigram
    model — sharper than the unigram signal (text_unigram_logprob) at
    flagging word-salad whose unigrams are individually common.

        P(y|x) = (c(x y) + 1) / (prefix(x) + V)

    with c the corpus bigram count, prefix(x) = Σ_y c(x y) (derived from
    the bigram table, NOT the unigram table, so doc-final tokens don't
    skew the denominator), V = |corpus vocabulary|. Docs with < 2 tokens
    have no bigrams and drop out.

    Shape: one bigram explode feeds both the per-doc stream and the
    corpus count table (pinned, vocabulary-sized); the model joins are
    key-partitioned on the bigram/prefix — no broadcast of an unbounded
    vocabulary; V and nothing else crosses as a scalar.
    """
    n = F.size(F.col("toks"))
    big = F.transform(
        F.arrays_zip(
            F.slice(F.col("toks"), 1, n - 1), F.slice(F.col("toks"), 2, n - 1)
        ),
        lambda s: F.concat_ws(" ", s["0"], s["1"]),
    )
    # spread: tokenize+explode is the critical path on a single-file
    # scan (r15; no-op at cluster scale)
    toked = spread(docs.select("doc_id", "text")).select(
        "doc_id", tokenize(F.col("text")).alias("toks")
    )
    per_doc = (
        toked.where(n >= 2)
        .select("doc_id", F.explode(big).alias("bigram"))
    )
    big_counts = (
        per_doc.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .localCheckpoint(eager=False)
    )
    prefix_counts = (
        big_counts.groupBy(
            F.split(F.col("bigram"), " ").getItem(0).alias("x")
        )
        .agg(F.sum("c_xy").alias("c_x"))
    )
    vocab = (
        toked.select(F.explode(F.col("toks")).alias("term"))
        .agg(F.countDistinct("term").alias("v"))
    )
    # r15: the prefix join runs on the VOCABULARY-sized model table, not
    # the per-doc bigram stream — lp depends only on the bigram, so the
    # stream pays one model join + one doc aggregate instead of two
    # stream-wide shuffles (x depends on bigram; values unchanged)
    model = (
        big_counts
        .withColumn("x", F.split(F.col("bigram"), " ").getItem(0))
        .join(prefix_counts, "x")
        .select("bigram", "c_xy", "c_x")
    )
    joined = (
        per_doc.join(model, "bigram")
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.log(
                (F.col("c_xy") + 1.0) / (F.col("c_x") + F.col("v"))
            ).alias("lp"),
        )
    )
    return (
        joined.groupBy("doc_id")
        .agg(
            F.round(F.avg("lp"), BIGRAM_LM_ROUND).alias("avg_bigram_lp"),
            F.count(F.lit(1)).alias("n_bigrams"),
        )
        .orderBy("doc_id")
    )


def dd_bigram_logprob_sql(table: str = "documents") -> str:
    toks = dd_tokenize("text")
    return f"""
WITH toked AS (SELECT doc_id, {toks} AS t FROM {table}),
per_doc AS (
  SELECT doc_id, t[i] || ' ' || t[i+1] AS bigram
  FROM toked, LATERAL unnest(range(1, len(t))) AS g(i)
  WHERE len(t) >= 2
),
big_counts AS (
  SELECT bigram, count(*)::BIGINT AS c_xy FROM per_doc GROUP BY bigram
),
prefix_counts AS (
  SELECT string_split(bigram, ' ')[1] AS x, sum(c_xy)::BIGINT AS c_x
  FROM big_counts GROUP BY 1
),
vocab AS (
  SELECT count(DISTINCT term)::BIGINT AS v
  FROM (SELECT unnest(t) AS term FROM toked)
)
SELECT doc_id,
       round(avg(ln((c_xy + 1.0) / (c_x + v))), {BIGRAM_LM_ROUND})
         AS avg_bigram_lp,
       count(*)::BIGINT AS n_bigrams
FROM per_doc
JOIN big_counts USING (bigram)
JOIN prefix_counts ON string_split(bigram, ' ')[1] = prefix_counts.x
CROSS JOIN vocab
GROUP BY doc_id ORDER BY doc_id
""".strip()


# --- Zipf-law fit ------------------------------------------------------------

ZIPF_TOP = 1000


def zipf_fit(docs: DataFrame) -> DataFrame:
    """Zipf's-law fit over the corpus vocabulary: OLS slope of
    ln(frequency) vs ln(rank) across the top ZIPF_TOP terms (natural
    text ~ -1; strong deviation flags synthetic/boilerplate corpora).

    The global rank is confined to the TRUNCATED head: orderBy+limit is
    a TakeOrderedAndProject (top-N heaps, no full sort), and the
    row_number window then rides <= ZIPF_TOP rows. The full vocabulary
    is never globally sorted — the fit statistic over the head is the
    standard formulation precisely because it keeps rank computation
    bounded. One regr aggregate out.
    """
    from pyspark.sql import Window

    top = (
        docs.select(F.explode(tokenize(F.col("text"))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("term"))
        .limit(ZIPF_TOP)
    )
    w = Window.orderBy(F.desc("c"), F.asc("term"))
    ranked = top.withColumn("rnk", F.row_number().over(w))
    return ranked.agg(
        F.count(F.lit(1)).alias("n_terms"),
        F.round(
            F.regr_slope(F.log(F.col("c")), F.log(F.col("rnk"))),
            SCORE_ROUND,
        ).alias("zipf_slope"),
        F.round(
            F.corr(F.log(F.col("c")), F.log(F.col("rnk"))),
            SCORE_ROUND,
        ).alias("fit_r"),
    )


def dd_zipf_fit_sql(table: str = "documents") -> str:
    toks = dd_tokenize("text")
    return f"""
WITH top AS (
  SELECT term, count(*)::BIGINT AS c
  FROM (SELECT unnest({toks}) AS term FROM {table})
  GROUP BY term ORDER BY c DESC, term ASC LIMIT {ZIPF_TOP}
),
ranked AS (
  SELECT c, row_number() OVER (ORDER BY c DESC, term ASC) AS rnk FROM top
)
SELECT count(*)::BIGINT AS n_terms,
       round(regr_slope(ln(c), ln(rnk)), {SCORE_ROUND}) AS zipf_slope,
       round(corr(ln(c), ln(rnk)), {SCORE_ROUND}) AS fit_r
FROM ranked
""".strip()


# --- readability scores ------------------------------------------------------

READ_ROUND = 4
_SENT_SPLIT_RE = "[.!?]+"
_VOWEL_RUNS = "[aeiouy]+"


def readability_scores(docs: DataFrame) -> DataFrame:
    """Flesch-style readability per document from three deterministic
    counts: words (tokenize), sentences (same [.!?]+ rule as the
    sentence UDTF, empties dropped, floor 1), and syllables (vowel runs
    per word, floor 1 — the standard dictionary-free heuristic).

        flesch = 206.835 - 1.015*(words/sentences)
                         - 84.6*(syllables/words)

    Pure per-row expression work — no shuffle at all until the
    presentation sort; scan-bound at any corpus size. Docs with zero
    tokens drop out (undefined ratio).
    """
    docs = spread(docs)  # scan-CPU-bound projection (r14: 1.6x measured)
    toks = tokenize(F.col("text"))
    syl = F.aggregate(
        F.transform(
            toks,
            lambda t: F.greatest(
                F.size(F.regexp_extract_all(t, F.lit(_VOWEL_RUNS), 0)),
                F.lit(1),
            ),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    sents = F.greatest(
        F.size(
            F.filter(
                F.transform(
                    F.split(F.col("text"), _SENT_SPLIT_RE),
                    lambda x: F.trim(x),
                ),
                lambda x: x != "",
            )
        ),
        F.lit(1),
    )
    n_words = F.size(toks)
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (n_words.cast("double") / sents)
        - F.lit(84.6) * (syl.cast("double") / n_words)
    )
    return (
        docs.where(n_words >= 1)
        .select(
            "doc_id",
            n_words.alias("n_words"),
            sents.alias("n_sentences"),
            syl.alias("n_syllables"),
            F.round(flesch, READ_ROUND).alias("flesch"),
        )
        .orderBy("doc_id")
    )


def dd_readability_sql(table: str = "documents") -> str:
    toks = dd_tokenize("text")
    return f"""
WITH t AS (
  SELECT doc_id,
         {toks} AS toks,
         greatest(len(list_filter(
           list_transform(regexp_split_to_array(text, '{_SENT_SPLIT_RE}'),
                          x -> trim(x)),
           x -> x <> '')), 1) AS n_sentences
  FROM {table}
)
SELECT doc_id,
       len(toks)::INT AS n_words,
       n_sentences::INT AS n_sentences,
       list_sum(list_transform(toks,
         x -> greatest(len(regexp_extract_all(x, '{_VOWEL_RUNS}')), 1)
       ))::INT AS n_syllables,
       round(206.835
             - 1.015 * (len(toks) * 1.0 / n_sentences)
             - 84.6 * (list_sum(list_transform(toks,
                 x -> greatest(len(regexp_extract_all(x, '{_VOWEL_RUNS}')), 1)
               )) * 1.0 / len(toks)),
             {READ_ROUND}) AS flesch
FROM t WHERE len(toks) >= 1 ORDER BY doc_id
""".strip()


# --- Gopher quality rules (Rae et al. 2021, arXiv:2112.11446, Table A1) -------

# the paper's required-stopword set: a document must contain >= 2
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000


def _gopher_quality_exprs() -> tuple:
    """(n_words column, ordered {flag name: column}) — the Gopher
    quality gates as pure expressions over F.col('text'), shared by
    gopher_quality and the fused one-scan projection in filter_funnel
    (r14: the funnel previously joined three frames on doc_id; quality
    and C4 are both narrow per-doc projections of the same scan, so
    computing them in ONE select removes a whole join and a text
    scan)."""
    words = F.filter(F.split(F.col("text"), "\\s+"), lambda t: t != "")
    lines = F.filter(F.split(F.col("text"), "\n"),
                     lambda l: F.trim(l) != "")
    lw = F.lower(F.col("text"))
    n = F.size(words).cast("long")
    total_wchars = F.aggregate(
        words, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    alpha_words = F.size(
        F.filter(words, lambda w: w.rlike("[A-Za-z]"))
    ).cast("long")
    n_hash = (F.length("text")
              - F.length(F.regexp_replace("text", "#", ""))).cast("long")
    n_ellipsis = (
        (F.length("text")
         - F.length(F.regexp_replace("text", "\\.\\.\\.", ""))) / 3
    ).cast("long")
    n_lines = F.size(lines).cast("long")
    bullet_lines = F.size(F.filter(
        lines, lambda l: l.rlike("^\\s*[-*•] ")
    )).cast("long")
    ellipsis_lines = F.size(F.filter(
        lines, lambda l: l.rlike("\\.\\.\\.$")
    )).cast("long")
    n_stop = F.size(F.filter(
        F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
        lambda s: F.arrays_overlap(
            F.array(s), F.filter(F.split(lw, "\\s+"), lambda t: t != "")
        ),
    )).cast("int")
    flags = {
        "f_word_count": (n >= GOPHER_MIN_WORDS) & (n <= GOPHER_MAX_WORDS),
        "f_mean_word_len": (F.lit(3) * n <= total_wchars)
        & (total_wchars <= F.lit(10) * n),
        "f_symbol_hash": F.lit(10) * n_hash <= n,
        "f_symbol_ellipsis": F.lit(10) * n_ellipsis <= n,
        "f_bullet_lines": F.lit(10) * bullet_lines <= F.lit(9) * n_lines,
        "f_ellipsis_lines": F.lit(10) * ellipsis_lines
        <= F.lit(3) * n_lines,
        "f_alpha_words": F.lit(5) * alpha_words >= F.lit(4) * n,
        "f_stopwords": n_stop >= 2,
    }
    return n, flags


def gopher_quality(docs: DataFrame) -> DataFrame:
    """The Gopher corpus-quality rule set as per-doc boolean gates, each
    an EXACT integer comparison (cross-multiplication instead of ratio
    floats, so the DuckDB twin hashes identically):

    - word count in [50, 100000];
    - mean word length in [3, 10]  (3n <= total_chars <= 10n);
    - symbol-to-word ratio <= 0.1 PER SYMBOL (10 * #'#' <= n AND
      10 * #'...' <= n — Table A1 applies the 0.1 threshold to the hash
      symbol and the ellipsis each on its own, not pooled);
    - <= 90% of lines start with a bullet (the paper REMOVES documents
      with more than 90% bullet lines — a list-formatted doc is fine),
      <= 30% end with ellipsis;
    - >= 80% of words contain an alphabetic char  (5a >= 4n);
    - >= 2 of the 8 required stopwords present.

    Everything is a column expression over one scan — the standard
    first-pass web-corpus filter at 100 TB is exactly this shape (no
    joins, no shuffle until the caller aggregates the keep-set).
    Output: doc_id, n_words, the six flags, gopher_pass.
    """
    docs = spread(docs)  # scan-CPU-bound projection (r14: 3.0x measured)
    n, flags = _gopher_quality_exprs()
    gopher_pass = None
    for c in flags.values():
        gopher_pass = c if gopher_pass is None else (gopher_pass & c)
    return docs.select(
        "doc_id",
        n.alias("n_words"),
        *[c.alias(name) for name, c in flags.items()],
        gopher_pass.alias("gopher_pass"),
    )


def dd_gopher_quality_sql(table: str = "documents") -> str:
    stop_list = ", ".join(f"'{s}'" for s in GOPHER_STOPWORDS)
    return f"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'),
                     x -> x <> '') AS words,
         list_filter(list_transform(string_split(text, chr(10)),
                                    l -> l),
                     l -> trim(l) <> '') AS lines,
         text, lower(text) AS lw
  FROM {table}
),
m AS (
  SELECT doc_id,
         len(words)::BIGINT AS n,
         coalesce(list_sum(list_transform(words, w -> len(w))),
                  0)::BIGINT AS total_wchars,
         len(list_filter(words,
             w -> regexp_matches(w, '[A-Za-z]')))::BIGINT AS alpha_words,
         (len(text) - len(replace(text, '#', '')))::BIGINT AS n_hash,
         ((len(text) - len(replace(text, '...', ''))) / 3)::BIGINT
           AS n_ellipsis,
         len(lines)::BIGINT AS n_lines,
         len(list_filter(lines,
             l -> regexp_matches(l, '^\\s*[-*•] ')))::BIGINT
           AS bullet_lines,
         len(list_filter(lines,
             l -> regexp_matches(l, '\\.\\.\\.$')))::BIGINT
           AS ellipsis_lines,
         len(list_filter([{stop_list}],
             s -> list_contains(
               list_filter(string_split_regex(lw, '\\s+'), x -> x <> ''),
               s)))::INT AS n_stop
  FROM t
)
SELECT doc_id, n AS n_words,
       (n >= {GOPHER_MIN_WORDS} AND n <= {GOPHER_MAX_WORDS})
         AS f_word_count,
       (3 * n <= total_wchars AND total_wchars <= 10 * n)
         AS f_mean_word_len,
       (10 * n_hash <= n) AS f_symbol_hash,
       (10 * n_ellipsis <= n) AS f_symbol_ellipsis,
       (10 * bullet_lines <= 9 * n_lines) AS f_bullet_lines,
       (10 * ellipsis_lines <= 3 * n_lines) AS f_ellipsis_lines,
       (5 * alpha_words >= 4 * n) AS f_alpha_words,
       (n_stop >= 2) AS f_stopwords,
       ((n >= {GOPHER_MIN_WORDS} AND n <= {GOPHER_MAX_WORDS})
        AND (3 * n <= total_wchars AND total_wchars <= 10 * n)
        AND (10 * n_hash <= n)
        AND (10 * n_ellipsis <= n)
        AND (10 * bullet_lines <= 9 * n_lines)
        AND (10 * ellipsis_lines <= 3 * n_lines)
        AND (5 * alpha_words >= 4 * n)
        AND (n_stop >= 2)) AS gopher_pass
FROM m ORDER BY doc_id
""".strip()


# --- C4 line-level filters (Raffel et al. 2019, arXiv:1910.10683 §2.2) --------

C4_MIN_LINE_WORDS = 5
C4_MIN_SENTENCES = 3


def _c4_keep_page_expr():
    """The C4 page gate as a pure expression over F.col('text') —
    shared by c4_line_filters and filter_funnel's fused projection
    (the gate needs only the sentence count and the two substring
    probes, not the per-line exprs)."""
    n_sent = (
        F.length("text")
        - F.length(F.regexp_replace("text", "[.!?]", ""))
    ).cast("long")
    has_lorem = F.lower(F.col("text")).contains("lorem ipsum")
    has_brace = F.col("text").contains("{")
    return (n_sent >= C4_MIN_SENTENCES) & ~has_lorem & ~has_brace


def c4_line_filters(docs: DataFrame) -> DataFrame:
    """The C4 cleaning rules as per-doc counts + gates (all exact
    integers/booleans): a line is KEPT iff it has >= 5 words and ends in
    terminal punctuation (. ! ? or a closing quote); a page is kept iff
    it has >= 3 sentences (approximated, as in the paper's pipeline, by
    terminal-punctuation marks), no 'lorem ipsum', and no '{' (code
    boilerplate). Single scan, column expressions only — at 100 TB this
    runs fused with ingest. Output: doc_id, n_lines, n_kept_lines,
    n_sentences, has_lorem, has_brace, keep_page."""
    docs = spread(docs)  # scan-CPU-bound projection (r14 measured)
    lines = F.filter(F.split(F.col("text"), "\n"),
                     lambda l: F.trim(l) != "")
    kept = F.filter(
        lines,
        lambda l: (
            F.size(F.filter(F.split(l, "\\s+"), lambda t: t != ""))
            >= C4_MIN_LINE_WORDS
        ) & l.rlike('[.!?"]\\s*$'),
    )
    n_sent = (
        F.length("text")
        - F.length(F.regexp_replace("text", "[.!?]", ""))
    ).cast("long")
    has_lorem = F.lower(F.col("text")).contains("lorem ipsum")
    has_brace = F.col("text").contains("{")
    return docs.select(
        "doc_id",
        F.size(lines).cast("int").alias("n_lines"),
        F.size(kept).cast("int").alias("n_kept_lines"),
        n_sent.alias("n_sentences"),
        has_lorem.alias("has_lorem"),
        has_brace.alias("has_brace"),
        (
            (n_sent >= C4_MIN_SENTENCES) & ~has_lorem & ~has_brace
        ).alias("keep_page"),
    )


def dd_c4_line_filters_sql(table: str = "documents") -> str:
    return f"""
WITH t AS (
  SELECT doc_id, text,
         list_filter(string_split(text, chr(10)),
                     l -> trim(l) <> '') AS lines
  FROM {table}
)
SELECT doc_id,
       len(lines)::INT AS n_lines,
       len(list_filter(lines,
           l -> len(list_filter(string_split_regex(l, '\\s+'),
                                x -> x <> '')) >= {C4_MIN_LINE_WORDS}
                AND regexp_matches(l, '[.!?"]\\s*$')))::INT
         AS n_kept_lines,
       (len(text) - len(regexp_replace(text, '[.!?]', '', 'g')))::BIGINT
         AS n_sentences,
       contains(lower(text), 'lorem ipsum') AS has_lorem,
       contains(text, '{{') AS has_brace,
       ((len(text) - len(regexp_replace(text, '[.!?]', '', 'g')))
          >= {C4_MIN_SENTENCES}
        AND NOT contains(lower(text), 'lorem ipsum')
        AND NOT contains(text, '{{')) AS keep_page
FROM t ORDER BY doc_id
""".strip()


# --- filter funnel: per-rule attrition across the composed rule sets ---------

# ordered (stage name, flag column): the sequential application order a
# real pipeline runs — cheap structural gates first, n-gram repetition
# last. Order changes WHICH stage gets the blame for a doc failing
# several rules (the funnel semantics), not the final keep-set.
FUNNEL_STAGES = [
    ("word_count", "f_word_count"),
    ("mean_word_len", "f_mean_word_len"),
    ("symbol_hash", "f_symbol_hash"),
    ("symbol_ellipsis", "f_symbol_ellipsis"),
    ("bullet_lines", "f_bullet_lines"),
    ("ellipsis_lines", "f_ellipsis_lines"),
    ("alpha_words", "f_alpha_words"),
    ("stopwords", "f_stopwords"),
    ("gopher_repetition", "rep_pass"),
    ("c4_page", "keep_page"),
]


def filter_funnel(docs: DataFrame) -> DataFrame:
    """Per-rule attrition funnel across the composed curation rules
    (Gopher quality -> Gopher repetition -> C4 page gates): for each
    stage, how many docs reached it, how many it removed, how many
    survived — the report every large-scale curation pipeline publishes
    (e.g. RefinedWeb Fig. 2's removal-rate table).

    One flag pass per rule family (quality = a single scan of column
    expressions; repetition = the shared n-gram aggregate; C4 = a
    single scan), joined once on doc_id — then each doc reduces to its
    funnel DEPTH (index of the first failing stage, n_stages if none
    fails), a single int per doc, so the funnel itself is a <=11-row
    aggregate joined to a broadcast stage table: per-STAGE cost is
    zero extra scans at any corpus size (the naive form rescans the
    corpus once per rule to count survivors).
    Output: stage_idx, stage, n_in, n_removed, n_out (exact integers).
    """
    # r14: quality and C4 are both narrow per-doc projections over the
    # same text scan — compute all nine scan-side flags in ONE select
    # (one text scan instead of two, one join on doc_id instead of two;
    # only the repetition side carries an aggregate). Flag expressions
    # are the shared helpers gopher_quality / c4_line_filters use, so
    # the funnel's gates stay definitionally identical to the
    # stand-alone queries'.
    _, qflags = _gopher_quality_exprs()
    flags7 = [c for _, c in FUNNEL_STAGES if c.startswith("f_")]
    scan_side = spread(docs).select(
        "doc_id",
        *[qflags[name].alias(name) for name in flags7],
        _c4_keep_page_expr().alias("keep_page"),
    )
    j = scan_side.join(
        gopher_repetition(docs).select("doc_id", "rep_pass"), "doc_id"
    )
    depth = None
    for i, (_, col) in enumerate(FUNNEL_STAGES):
        cond = ~F.col(col)
        depth = (F.when(cond, i) if depth is None
                 else depth.when(cond, i))
    depth = depth.otherwise(len(FUNNEL_STAGES))
    counts = j.select(depth.alias("depth")).groupBy("depth").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    stages = docs.sparkSession.createDataFrame(
        [(i, name) for i, (name, _) in enumerate(FUNNEL_STAGES)],
        "stage_idx int, stage string",
    )
    return (
        stages.join(
            F.broadcast(counts),
            counts["depth"] >= stages["stage_idx"], "left",
        )
        .groupBy("stage_idx", "stage")
        .agg(
            F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("n_in"),
            F.coalesce(
                F.sum(F.when(F.col("depth") == F.col("stage_idx"),
                             F.col("cnt"))),
                F.lit(0),
            ).cast("long").alias("n_removed"),
            (F.coalesce(F.sum("cnt"), F.lit(0)) - F.coalesce(
                F.sum(F.when(F.col("depth") == F.col("stage_idx"),
                             F.col("cnt"))), F.lit(0)
            )).cast("long").alias("n_out"),
        )
        .orderBy("stage_idx")
    )


def dd_filter_funnel_sql(table: str = "documents") -> str:
    depth_case = " ".join(
        f"WHEN NOT {col} THEN {i}"
        for i, (_, col) in enumerate(FUNNEL_STAGES)
    )
    stage_values = ", ".join(
        f"({i}, '{name}')" for i, (name, _) in enumerate(FUNNEL_STAGES)
    )
    return f"""
WITH gq AS ({dd_gopher_quality_sql(table)}),
gr AS ({dd_gopher_repetition_sql(table)}),
c4 AS ({dd_c4_line_filters_sql(table)}),
j AS (
  SELECT gq.doc_id, gq.f_word_count, gq.f_mean_word_len,
         gq.f_symbol_hash, gq.f_symbol_ellipsis, gq.f_bullet_lines,
         gq.f_ellipsis_lines, gq.f_alpha_words, gq.f_stopwords,
         gr.rep_pass, c4.keep_page
  FROM gq JOIN gr USING (doc_id) JOIN c4 USING (doc_id)
),
depths AS (
  SELECT CASE {depth_case} ELSE {len(FUNNEL_STAGES)} END AS depth FROM j
),
counts AS (SELECT depth, count(*)::BIGINT AS cnt FROM depths GROUP BY depth),
stages(stage_idx, stage) AS (VALUES {stage_values})
SELECT s.stage_idx, s.stage,
       coalesce(sum(c.cnt), 0)::BIGINT AS n_in,
       coalesce(sum(CASE WHEN c.depth = s.stage_idx THEN c.cnt END),
                0)::BIGINT AS n_removed,
       (coalesce(sum(c.cnt), 0)
        - coalesce(sum(CASE WHEN c.depth = s.stage_idx THEN c.cnt END),
                   0))::BIGINT AS n_out
FROM stages s LEFT JOIN counts c ON c.depth >= s.stage_idx
GROUP BY s.stage_idx, s.stage
ORDER BY s.stage_idx
""".strip()


# --- Gopher repetition rules (arXiv:2112.11446 Table A1, bottom half) ---------

# (n, kind, scaled threshold as (lhs_mult, rhs_mult)): flag passes iff
# lhs_mult * chars_in_grams <= rhs_mult * total_chars — the paper's
# "fraction of characters in the most common n-gram" (top) and
# "fraction of characters inside duplicated n-grams" (dup) thresholds
# 0.20/0.18/0.16 and 0.15/0.10, cross-multiplied to exact integers.
GOPHER_REP_RULES = [
    (2, "top", 5, 1),     # top-2-gram chars / total <= 0.20
    (3, "top", 50, 9),    # <= 0.18
    (4, "top", 25, 4),    # <= 0.16
    (5, "dup", 20, 3),    # dup-5-gram chars / total <= 0.15
    (10, "dup", 10, 1),   # <= 0.10
]


def gopher_repetition(docs: DataFrame) -> DataFrame:
    """The repetition half of the Gopher rule set: per doc, the
    character mass of the most-frequent n-gram (n=2,3,4) and of all
    DUPLICATED n-grams (n=5,10, every occurrence counted), each gated
    against the paper's threshold by integer cross-multiplication.

    Scale shape (r14): MAP-ONLY. n-grams never leave their document, so
    the whole statistic is a per-doc local computation — one Arrow
    mapInPandas pass counts each size's grams with a hash map per doc
    and emits the five character masses directly. The r9 shape
    (posexplode + per-doc lead() window + a (doc_id, n, gram) aggregate
    + a per-doc aggregate + join back) paid two doc-keyed shuffles and
    a window sort of ~6 rows PER WORD — at 100 TB that is shuffling the
    corpus several times over for counts that are per-doc local. Now
    zero shuffles (spread's scan repartition locally only). Python-side
    cost is bounded by doc length, grams are counted as word TUPLES
    (join is injective — words contain no whitespace — so tuple counts
    equal string counts) and only distinct grams pay the join for their
    character length. Semantics unchanged and oracle-pinned: same
    Java-\\s+ split (literally [ \\t\\n\\x0B\\f\\r]+), same most-frequent
    tie-break (max count, then LONGER gram — not max mass), same
    every-occurrence dup mass, null text -> null total_chars and null
    flags exactly as the old left join produced. Flags stay codegen
    integer cross-multiplication. Output: doc_id, total_chars,
    top2/top3/top4_chars, dup5/dup10_chars, the five flags, rep_pass.
    """
    import pandas as pd

    top_ns = [n for n, kind, _, _ in GOPHER_REP_RULES if kind == "top"]
    dup_ns = [n for n, kind, _, _ in GOPHER_REP_RULES if kind == "dup"]
    mass_cols = [f"{kind}{n}_chars" for n, kind, _, _ in GOPHER_REP_RULES]

    def doc_stats(batches):
        import re
        from collections import Counter

        # Java regex \s — NOT Python \s, which also matches unicode
        # whitespace and would drift the word split from the SQL form.
        ws = re.compile("[ \t\n\x0b\f\r]+")
        for pdf in batches:
            out = {c: [] for c in
                   ["doc_id", "total_chars"] + mass_cols}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                out["doc_id"].append(doc_id)
                if text is None:
                    out["total_chars"].append(None)
                    for c in mass_cols:
                        out[c].append(0)
                    continue
                out["total_chars"].append(len(text))
                w = [t for t in ws.split(text) if t]
                for n in top_ns:
                    cnts = Counter(zip(*(w[i:] for i in range(n))))
                    best = 0
                    for g, c in cnts.items():
                        k = (c << 32) + (n - 1) + sum(map(len, g))
                        if k > best:
                            best = k
                    out[f"top{n}_chars"].append(
                        (best >> 32) * (best & 0xFFFFFFFF))
                for n in dup_ns:
                    cnts = Counter(zip(*(w[i:] for i in range(n))))
                    out[f"dup{n}_chars"].append(sum(
                        c * ((n - 1) + sum(map(len, g)))
                        for g, c in cnts.items() if c >= 2))
            res = pd.DataFrame(out)
            res["total_chars"] = res["total_chars"].astype("Int64")
            yield res

    schema = "doc_id long, total_chars long, " + ", ".join(
        f"{c} long" for c in mass_cols)
    base = spread(docs.select("doc_id", "text")).mapInPandas(
        doc_stats, schema)
    cols = {}
    for n, kind, _, _ in GOPHER_REP_RULES:
        cols[f"{kind}{n}_chars"] = F.col(f"{kind}{n}_chars")
    flags = {
        f"f_{kind}{n}": F.lit(lm) * cols[f"{kind}{n}_chars"]
        <= F.lit(rm) * F.col("total_chars")
        for n, kind, lm, rm in GOPHER_REP_RULES
    }
    rep_pass = None
    for c in flags.values():
        rep_pass = c if rep_pass is None else (rep_pass & c)
    return base.select(
        "doc_id",
        "total_chars",
        *[c.alias(name) for name, c in cols.items()],
        *[c.alias(name) for name, c in flags.items()],
        rep_pass.alias("rep_pass"),
    )


def dd_gopher_repetition_sql(table: str = "documents") -> str:
    sizes = sorted({n for n, _, _, _ in GOPHER_REP_RULES})
    gram_selects = "\nUNION ALL\n".join(
        f"""  SELECT doc_id, {n} AS n,
         unnest(list_transform(
           range(1, greatest(len(words) - {n - 1}, 0) + 1),
           i -> array_to_string(list_slice(words, i, i + {n - 1}), ' ')
         )) AS gram
  FROM t"""
        for n in sizes
    )
    # most-frequent gram = max over cnt*2^32 + glen packed into one
    # BIGINT, mirroring the Spark side token-for-token (max count,
    # tie-break longer gram; both < 2^31 so the key is exact)
    top_aggs = ",\n         ".join(
        f"max(CASE WHEN n = {n} THEN cnt * 4294967296 + glen END)"
        f" AS top{n}_key"
        for n, kind, _, _ in GOPHER_REP_RULES if kind == "top"
    )
    dup_aggs = ",\n         ".join(
        f"sum(CASE WHEN n = {n} AND cnt >= 2 THEN cnt * glen END)"
        f" AS dup{n}_raw"
        for n, kind, _, _ in GOPHER_REP_RULES if kind == "dup"
    )

    def _mass(n: int, kind: str) -> str:
        if kind == "top":
            return (f"coalesce((top{n}_key // 4294967296)"
                    f" * (top{n}_key % 4294967296), 0)::BIGINT")
        return f"coalesce(dup{n}_raw, 0)::BIGINT"

    col_exprs = ",\n         ".join(
        f"{_mass(n, kind)} AS {kind}{n}_chars"
        for n, kind, _, _ in GOPHER_REP_RULES
    )
    flag_exprs = ",\n       ".join(
        f"({lm} * {kind}{n}_chars <= {rm} * total_chars) AS f_{kind}{n}"
        for n, kind, lm, rm in GOPHER_REP_RULES
    )
    pass_expr = " AND ".join(
        f"({lm} * {kind}{n}_chars <= {rm} * total_chars)"
        for n, kind, lm, rm in GOPHER_REP_RULES
    )
    return f"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'),
                     x -> x <> '') AS words
  FROM {table}
),
grams AS (
{gram_selects}
),
counted AS (
  SELECT doc_id, n, gram,
         count(*)::BIGINT AS cnt, len(gram)::BIGINT AS glen
  FROM grams GROUP BY doc_id, n, gram
),
per_doc AS (
  SELECT doc_id,
         {top_aggs},
         {dup_aggs}
  FROM counted GROUP BY doc_id
),
base AS (
  SELECT d.doc_id, len(d.text)::BIGINT AS total_chars,
         p.* EXCLUDE (doc_id)
  FROM {table} d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
),
massed AS (
  SELECT doc_id, total_chars,
         {col_exprs}
  FROM base
)
SELECT doc_id, total_chars,
       {", ".join(f"{kind}{n}_chars" for n, kind, _, _ in GOPHER_REP_RULES)},
       {flag_exprs},
       ({pass_expr}) AS rep_pass
FROM massed ORDER BY doc_id
""".strip()
