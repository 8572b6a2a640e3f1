"""Deduplication operators for LLM training-data pipelines.

These generalize the reference's parts (tokenizer T7, postings layout Q3)
into the dedup family a 100 TB corpus pipeline needs (project north-star):

- exact:       hash-groupBy on content fingerprint (one shuffle, partial agg)
- minhash LSH: shingle -> md5 minhash signature -> banded bucket self-join.
  Only documents sharing a band bucket are ever paired, so the pair space
  is bucket-local — THE scale path for near-dup at 100 TB.
- n-gram Jaccard (exact): inverted-index co-occurrence join — pairs sharing
  >=1 shingle, |A∩B| from a groupBy, |A∪B| = |A|+|B|-|A∩B|. Never
  materializes the full N² pair matrix.
- simhash: per-token signed bit votes -> 32-bit signature per doc; hamming
  candidates join on signature bands.
- embedding cosine: exact pairwise above a threshold (test scale); the LSH
  route for production lives in operators/knn.py + this module's banding.
- SemDeDup (semdedup): cluster-bucketed semantic dedup — pairwise only
  within embedding cells, keep-the-diverse rule (arXiv:2303.09540).
- duplicate spans (dedup_duplicate_spans): exact substring dedup in the
  hashed fixed-N n-gram form (arXiv:2107.06499) — inverted index +
  gaps-and-islands span merge.

All hashing is md5-based (functions/hashing.py) so every stage is
reproducible in the DuckDB oracle.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import SCORE_ROUND
from ..functions.hashing import dd_h64, h64
from ..functions.text import dd_shingles, dd_tokenize, shingles, tokenize
from ..functions.vector import dd_cosine_similarity

SHINGLE_N = 3
MINHASH_NUM = 16
MINHASH_BANDS = 8  # 8 bands x 2 rows: P(candidate | J=0.5) ~ 0.90
MINHASH_ROWS = MINHASH_NUM // MINHASH_BANDS
JACCARD_THRESHOLD = 0.5
COSINE_DUP_THRESHOLD = 0.4
SIMHASH_BITS = 32


def _doc_shingles(docs: DataFrame) -> DataFrame:
    """(doc_id, s): DISTINCT shingles per document.

    Two performance choices, both result-identical to the naive
    explode(shingles(...)) form (the oracle's form):
    - repartition before tokenizing: a small parquet input arrives as ONE
      split, which would run the whole regex/shingle pass on one core; at
      cluster scale the input splits provide this parallelism naturally.
    - shingles via arrays_zip of three shifted slices + concat_ws instead
      of transform(sequence, slice) — stays in codegen, ~4x faster than
      the interpreted higher-order-function path.
    """
    spark = docs.sparkSession
    toks = docs.repartition(spark.sparkContext.defaultParallelism).select(
        "doc_id", tokenize(F.col("text")).alias("t")
    )
    k = SHINGLE_N
    zipped = toks.where(F.size("t") >= k).select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                *[
                    F.expr(f"slice(t, {i + 1}, size(t) - {k - 1})").alias(
                        chr(97 + i)
                    )
                    for i in range(k)
                ]
            )
        ).alias("z"),
    ).select(
        "doc_id",
        F.concat_ws(
            " ", *[F.col(f"z.{chr(97 + i)}") for i in range(k)]
        ).alias("s"),
    )
    short = toks.where(F.size("t") < k).select(
        "doc_id", F.array_join("t", " ").alias("s")
    )
    return zipped.unionByName(short).distinct()


def dedup_exact(docs: DataFrame) -> DataFrame:
    """Exact duplicate groups: fingerprint, group size, kept doc_id.

    One hash shuffle on the fingerprint; map-side partial aggregation makes
    this linear in corpus size regardless of duplicate skew.
    """
    return (
        docs.select(F.md5(F.col("text")).alias("fp"), "doc_id")
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("cnt"), F.min("doc_id").alias("keep_id"))
    )


def minhash_signatures_wide(docs: DataFrame) -> DataFrame:
    """(doc_id, mh0..mh{MINHASH_NUM-1}): the per-seed minhashes as ONE
    row per document (r14). The long form exploded every shingle row
    MINHASH_NUM ways and aggregated (doc_id, seed) keys — 16x the rows
    through the hash-aggregate and 16x the shuffle keys for the same md5
    work. Here each shingle row evaluates the same MINHASH_NUM h64
    expressions as columns and one doc-keyed aggregate carries
    MINHASH_NUM min accumulators; the per-seed hash input is the
    identical string (str(seed) + '#' + shingle), so every mh value is
    bit-equal to the long form's."""
    sh = _doc_shingles(docs)
    return sh.groupBy("doc_id").agg(
        *[
            F.min(h64(F.concat(F.lit(f"{i}#"), F.col("s")))).alias(f"mh{i}")
            for i in range(MINHASH_NUM)
        ]
    )


def minhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, seed, mh): per-seed minhash over distinct shingles —
    the long form consumed by the written signature store and the
    incremental decide path; derived from the wide single-aggregate
    pass (one doc-keyed shuffle instead of the old 16-way seed explode
    + (doc_id, seed) aggregate), then unpacked with a posexplode whose
    pos IS the seed. Values bit-equal to the r13 form."""
    return minhash_signatures_wide(docs).select(
        "doc_id",
        F.posexplode(
            F.array(*[F.col(f"mh{i}") for i in range(MINHASH_NUM)])
        ).alias("seed", "mh"),
    )


def _band_sigs(sig: DataFrame) -> DataFrame:
    """(doc_id, band, sig): per-band md5 over the band's seed-ordered
    minhashes — the LSH bucket key. Shared by the self-join
    (dedup_minhash_lsh) and the batch-vs-existing incremental form."""
    return (
        sig.withColumn("band", (F.col("seed") / F.lit(MINHASH_ROWS)).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct(F.col("seed"), F.col("mh")))
                        ),
                        lambda x: x["mh"].cast("string"),
                    ),
                    ",",
                )
            ).alias("sig")
        )
    )


def _band_sigs_wide(sigw: DataFrame) -> DataFrame:
    """(doc_id, band, sig) computed from the WIDE signature table as a
    pure projection (r14): band b's key is md5 over that band's seeds'
    minhashes joined by ',' in seed order — with the seeds as columns,
    that is a concat_ws over MINHASH_ROWS casts, no groupBy at all. The
    long-form _band_sigs paid a second doc-keyed shuffle plus a
    collect_list+array_sort per (doc, band) to recover exactly this seed
    order. Byte-equal keys: array_sort on (seed, mh) structs orders by
    the unique seed, and concat_ws(',') over non-null longs matches
    array_join of their string casts."""
    bands = [
        F.struct(
            F.lit(b).alias("band"),
            F.md5(
                F.concat_ws(
                    ",",
                    *[
                        F.col(f"mh{b * MINHASH_ROWS + j}").cast("string")
                        for j in range(MINHASH_ROWS)
                    ],
                )
            ).alias("sig"),
        )
        for b in range(MINHASH_BANDS)
    ]
    return sigw.select(
        "doc_id", F.explode(F.array(*bands)).alias("bs")
    ).select(
        "doc_id",
        F.col("bs.band").alias("band"),
        F.col("bs.sig").alias("sig"),
    )


def _lsh_est_filter(cand: DataFrame, sig: DataFrame) -> DataFrame:
    """(doc_a, doc_b) candidates -> (doc_a, doc_b, est_jaccard) filtered at
    JACCARD_THRESHOLD: est is the fraction of agreeing minhashes — shared
    by the unbounded self-join and the bucket-bounded star emission (the
    candidate SET is what differs between them, never the scoring)."""
    est = (
        cand.join(sig.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(
            sig.alias("sb"),
            (F.col("doc_b") == F.col("sb.doc_id"))
            & (F.col("sa.seed") == F.col("sb.seed")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(
            F.round(
                F.avg(
                    F.when(F.col("sa.mh") == F.col("sb.mh"), 1.0).otherwise(0.0)
                ),
                SCORE_ROUND,
            ).alias("est_jaccard")
        )
    )
    return est.where(F.col("est_jaccard") >= F.lit(JACCARD_THRESHOLD))


def _lsh_est_filter_wide(cand: DataFrame, sigw: DataFrame) -> DataFrame:
    """Wide-signature twin of :func:`_lsh_est_filter` (r14): joins ONE
    row per doc instead of MINHASH_NUM, and the agreement fraction is a
    codegen'd sum of indicator terms over the seed columns instead of a
    (doc_a, doc_b) re-aggregation — two joins and zero shuffles where
    the long form shuffled cand x MINHASH_NUM rows into a groupBy.
    Float-identical: the long form's avg sums 16 exact 1.0/0.0 doubles
    and divides by 16; so does this expression, in seed order."""
    a = sigw.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"mh{i}").alias(f"_a{i}") for i in range(MINHASH_NUM)],
    )
    b = sigw.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"mh{i}").alias(f"_b{i}") for i in range(MINHASH_NUM)],
    )
    agree = None
    for i in range(MINHASH_NUM):
        term = F.when(F.col(f"_a{i}") == F.col(f"_b{i}"), 1.0).otherwise(0.0)
        agree = term if agree is None else agree + term
    est = (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(agree / F.lit(float(MINHASH_NUM)), SCORE_ROUND)
            .alias("est_jaccard"),
        )
    )
    return est.where(F.col("est_jaccard") >= F.lit(JACCARD_THRESHOLD))


def dedup_minhash_lsh(docs: DataFrame) -> DataFrame:
    """Candidate near-dup pairs via banded minhash LSH, with the estimated
    Jaccard (fraction of agreeing minhashes) filtered at JACCARD_THRESHOLD.

    Output: doc_a, doc_b, est_jaccard.

    Scale caveat (r13 VERDICT): the band self-join emits ALL pairs within
    a bucket — O(M²) for a bucket of M docs. Web corpora have
    boilerplate clusters (empty pages, templates) of millions of
    near-identical docs; :func:`dedup_minhash_lsh_bounded` is the
    production form that caps that emission.

    r14: built on the WIDE signature table — one doc-keyed aggregate
    for all 16 minhashes, band keys as a projection, est_jaccard as a
    codegen'd indicator sum over the seed columns. Bit-identical values
    (see the _wide helpers); the r13 long forms cost two extra shuffles
    and a 16x row expansion per query in this family.
    """
    sig = minhash_signatures_wide(docs).cache()
    bands = _band_sigs_wide(sig)
    cand = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    return _lsh_est_filter_wide(cand, sig)


#: Production bucket cap for bounded LSH: a band bucket of more than this
#: many docs switches from all-pairs to star emission (every member paired
#: with the bucket's min doc_id). 64 keeps exact est_jaccard pairing for
#: every realistic organic bucket while bounding a million-doc boilerplate
#: cluster to M-1 emitted pairs (the spanning set downstream components /
#: survivorship actually consume) instead of M(M-1)/2.
LSH_BUCKET_CAP = 64


def dedup_minhash_lsh_bounded(docs: DataFrame,
                              cap: int = LSH_BUCKET_CAP) -> DataFrame:
    """Banded minhash LSH with a HOT-BUCKET BOUND (r13 VERDICT #1 — the
    one remaining scale hazard): within any (band, sig) bucket of at
    most ``cap`` docs the emission is the exact all-pairs self-join
    (identical semantics to :func:`dedup_minhash_lsh`); a LARGER bucket
    emits star pairs to the bucket's min doc_id instead, making emitted
    pairs linear in bucket size. A web-scale boilerplate cluster of M
    near-identical docs (empty pages, templates — the norm in crawled
    corpora) costs M-1 pairs instead of M²/2.

    The star set is a spanning set of the bucket: every downstream
    consumer (connected components, survivorship, leakage-safe split)
    groups docs by pair-graph connectivity, and hub-to-member edges
    connect exactly the docs all-pairs would — component grouping over
    a true dup cluster is preserved (pinned on an adversarial M-dup
    fixture in tests/test_dedup_strategies.py at M x10/x100). The
    est_jaccard threshold still applies to star pairs — for genuinely
    near-identical cluster members hub agreement ~= member agreement,
    and below-threshold hash-collision buckets are dropped either way.

    Output: doc_a, doc_b, est_jaccard — same contract as the unbounded
    form. One extra aggregate over the bands table (bucket size + hub),
    same single bucket-key shuffle; no new corpus-scale pass.
    """
    from pyspark.sql import Window

    sig = minhash_signatures_wide(docs).cache()
    bands = _band_sigs_wide(sig)
    w = Window.partitionBy("band", "sig")
    bx = bands.withColumn("bsz", F.count(F.lit(1)).over(w)).withColumn(
        "hub", F.min("doc_id").over(w)
    )
    small = bx.where(F.col("bsz") <= F.lit(cap)).select(
        "band", "sig", "doc_id"
    )
    pairs_small = (
        small.alias("a")
        .join(
            small.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
    )
    pairs_star = bx.where(
        (F.col("bsz") > F.lit(cap)) & (F.col("doc_id") != F.col("hub"))
    ).select(F.col("hub").alias("doc_a"), F.col("doc_id").alias("doc_b"))
    cand = pairs_small.unionByName(pairs_star).distinct()
    return _lsh_est_filter_wide(cand, sig)


def dedup_ngram_jaccard(docs: DataFrame,
                        strategy: str = "naive") -> DataFrame:
    """EXACT shingle-Jaccard near-dup pairs >= JACCARD_THRESHOLD.

    Two result-identical strategies (equality is property-tested in
    tests/test_dedup_strategies.py):

    - ``"naive"`` (default, what the registered query runs): inverted-index
      co-occurrence join — pairs sharing >= 1 shingle, intersection size
      from one groupBy, |A∪B| = |A|+|B|-|A∩B|. Cost is sum(df²) over
      shingles; on this corpus the hottest shingle has df≈25 (≈2.8M
      intermediate rows), which profiles 2-3x FASTER than prefix
      filtering's verify re-expansion.
    - ``"prefix"`` (the 100 TB path for heavy-tailed shingle
      distributions — real web text with boilerplate shingles at df in the
      millions): ppjoin-style prefix filter. J >= t forces intersection
      c >= ceil(t*n) for each side, so two qualifying docs must collide
      within their n - ceil(t*n) + 1 globally-RAREST shingles; candidate
      generation joins only those prefixes (hot shingles sort to the end
      and never generate candidates), then an exact intersection count
      verifies each candidate. Cost tracks rare-shingle collisions
      instead of sum(df²).

    Output: doc_a, doc_b, jaccard.
    """
    if strategy == "prefix":
        return _ngram_jaccard_prefix(docs)
    if strategy != "naive":
        raise ValueError(f"unknown strategy {strategy!r}")
    # the shingle table feeds three subtrees (sizes + both join sides);
    # persist it once instead of re-running tokenize+explode+distinct each
    d = _doc_shingles(docs).persist()
    sizes = d.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        d.alias("a")
        .join(
            d.alias("b"),
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        inter.join(
            sizes.select(F.col("doc_id").alias("doc_a"),
                         F.col("n").alias("na")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"),
                         F.col("n").alias("nb")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("c") / (F.col("na") + F.col("nb") - F.col("c")),
                SCORE_ROUND,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= F.lit(JACCARD_THRESHOLD))
    )


def _ngram_jaccard_prefix(docs: DataFrame) -> DataFrame:
    """ppjoin-style prefix-filtered exact Jaccard join (see
    dedup_ngram_jaccard docstring). Result-identical to the naive form.

    Bound used: J(A,B) >= t implies c = |A∩B| >= t*(|A|+|B|-c) and
    c <= min(|A|,|B|), hence c >= t*|A| and c >= t*|B|; a qualifying pair
    must therefore share a shingle within each side's first
    n - ceil(t*n) + 1 shingles under ANY fixed global order. Ordering by
    ascending document frequency puts the hot shingles at the tail, so
    they never enter the candidate join.
    """
    from pyspark.sql import Window

    # Slack below the nominal threshold: the FINAL filter (like naive's)
    # accepts round(J, SCORE_ROUND) >= t, which admits true J down to
    # t - 0.5*10^-SCORE_ROUND; the candidate bounds must therefore be
    # derived from that looser t', or a boundary pair naive keeps could
    # never become a candidate here.
    t = JACCARD_THRESHOLD - 0.5 * 10 ** (-SCORE_ROUND)
    d = _doc_shingles(docs).persist()
    sizes = d.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    df_tbl = d.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc_id").orderBy(F.asc("df"), F.asc("s"))
    ranked = (
        d.join(df_tbl, "s")
        .withColumn("r", F.row_number().over(w))
        .join(sizes, "doc_id")
    )
    prefix = ranked.where(
        F.col("r") <= F.col("n") - F.ceil(F.lit(t) * F.col("n")) + 1
    ).select("doc_id", "s", "n")
    # length filter: J >= t also forces t*max(na,nb) <= min(na,nb)
    cand = (
        prefix.alias("a")
        .join(
            prefix.alias("b"),
            (F.col("a.s") == F.col("b.s"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (
                F.least(F.col("a.n"), F.col("b.n"))
                >= F.lit(t) * F.greatest(F.col("a.n"), F.col("b.n"))
            ),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    verified = (
        cand.join(d.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(
            d.alias("sb"),
            (F.col("doc_b") == F.col("sb.doc_id"))
            & (F.col("sa.s") == F.col("sb.s")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        verified.join(
            sizes.select(F.col("doc_id").alias("doc_a"),
                         F.col("n").alias("na")),
            "doc_a",
        )
        .join(
            sizes.select(F.col("doc_id").alias("doc_b"),
                         F.col("n").alias("nb")),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("c") / (F.col("na") + F.col("nb") - F.col("c")),
                SCORE_ROUND,
            ).alias("jaccard"),
        )
        .where(F.col("jaccard") >= F.lit(JACCARD_THRESHOLD))
    )


def simhash_signatures(docs: DataFrame) -> DataFrame:
    """(doc_id, simhash): 32-bit simhash from tf-weighted token-bit votes.

    No explode-per-bit: the 32 bit-sums are wide aggregate expressions over
    the (doc, term, tf) table — one shuffle, codegen-friendly.
    """
    tf = (
        docs.select("doc_id", F.explode(tokenize(F.col("text"))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("h", h64(F.col("term")))
    )
    bit_sums = tf.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(
                    F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) == 1,
                    F.col("tf"),
                ).otherwise(-F.col("tf"))
            ).alias(f"b{j}")
            for j in range(SIMHASH_BITS)
        ]
    )
    sim = reduce(
        lambda acc, j: acc
        + F.when(F.col(f"b{j}") > 0, F.lit(2**j).cast("long")).otherwise(
            F.lit(0).cast("long")
        ),
        range(SIMHASH_BITS),
        F.lit(0).cast("long"),
    )
    return bit_sums.select("doc_id", sim.alias("simhash"))


def dedup_embedding_cosine(emb: DataFrame, num_blocks: int = 8) -> DataFrame:
    """Exact pairwise embedding near-dups >= COSINE_DUP_THRESHOLD.

    Distributed block-matrix self-join — NO driver-side materialization:
    vectors are hashed into ``num_blocks`` blocks, every unordered block
    pair (bi <= bj) becomes one ``applyInPandas`` group, and the group body
    is a numpy GEMM between the two blocks' L2-normalized matrices. Each
    vector is shuffled to its (num_blocks + 1) partner groups, so shuffle
    volume is O(N * B) while the (inherent, exact) N^2/2 pair compute is
    spread over B(B+1)/2 independent tasks. At 100 TB, raise ``num_blocks``
    so a block fits executor memory, or pre-bucket the pair space with
    minhash/LSH bands (this module) or IVF cells (operators/knn.py) and run
    the same GEMM per bucket for the approximate/cheaper path.

    Output: vec_a, vec_b, cos_sim (vec_a < vec_b).
    """
    return _embedding_pairs_gemm(emb, num_blocks, COSINE_DUP_THRESHOLD)


def _embedding_pairs_gemm(emb: DataFrame, num_blocks: int,
                          threshold: float) -> DataFrame:
    """The blocked-GEMM pair machinery behind dedup_embedding_cosine
    and dedup_embedding_whitened — one body so the block routing and
    the rounding cannot drift between the raw and whitened forms."""
    import numpy as np
    import pandas as pd

    B = num_blocks
    blk = F.pmod(F.col("vec_id"), F.lit(B)).cast("int")
    base = emb.select("vec_id", "embedding", blk.alias("blk"))
    # side "a" owns groups (blk, j>=blk); side "b" owns (i<=blk, blk).
    # Every cross-block pair lands in exactly one group; within-block pairs
    # land once via the a-side with the vec_a < vec_b guard below.
    side_a = base.select(
        F.col("blk").alias("bi"),
        F.explode(F.sequence(F.col("blk"), F.lit(B - 1))).alias("bj"),
        F.lit("a").alias("side"),
        "vec_id",
        "embedding",
    )
    side_b = base.select(
        F.explode(F.sequence(F.lit(0), F.col("blk"))).alias("bi"),
        F.col("blk").alias("bj"),
        F.lit("b").alias("side"),
        "vec_id",
        "embedding",
    )
    both = side_a.unionByName(side_b)

    def gemm(pdf: pd.DataFrame) -> pd.DataFrame:
        bi = int(pdf["bi"].iloc[0])
        bj = int(pdf["bj"].iloc[0])
        a = pdf[pdf["side"] == "a"]
        if bi == bj:
            # the block's vectors appear on both sides — use one copy and
            # keep each unordered pair once via the a_id < b_id mask
            b = a
        else:
            b = pdf[pdf["side"] == "b"]
        if a.empty or b.empty:
            return pd.DataFrame(
                {"vec_a": pd.Series(dtype="int64"),
                 "vec_b": pd.Series(dtype="int64"),
                 "cos_sim": pd.Series(dtype="float64")}
            )
        a_ids = a["vec_id"].to_numpy()
        b_ids = b["vec_id"].to_numpy()
        a_mat = np.stack(a["embedding"].to_numpy()).astype("float64")
        b_mat = np.stack(b["embedding"].to_numpy()).astype("float64")
        a_mat /= np.linalg.norm(a_mat, axis=1, keepdims=True)
        b_mat /= np.linalg.norm(b_mat, axis=1, keepdims=True)
        sims = np.round(a_mat @ b_mat.T, SCORE_ROUND)
        mask = sims >= threshold
        if bi == bj:
            mask &= a_ids[:, None] < b_ids[None, :]
        ai, bix = np.nonzero(mask)
        lo = np.minimum(a_ids[ai], b_ids[bix])
        hi = np.maximum(a_ids[ai], b_ids[bix])
        return pd.DataFrame(
            {"vec_a": lo, "vec_b": hi, "cos_sim": sims[ai, bix]}
        )

    return both.groupBy("bi", "bj").applyInPandas(
        gemm, "vec_a long, vec_b long, cos_sim double"
    )


# --- DuckDB oracle SQL ------------------------------------------------------


def dd_doc_shingles_cte(table: str = "documents") -> str:
    toks = dd_tokenize("text")
    return f"""
sh AS (
  SELECT DISTINCT doc_id, s FROM (
    SELECT doc_id, unnest({dd_shingles(toks, SHINGLE_N)}) AS s FROM {table}
  )
)
""".strip()


def dd_dedup_exact_sql(table: str = "documents") -> str:
    return f"""
SELECT md5(text) AS fp, count(*)::BIGINT AS cnt, min(doc_id) AS keep_id
FROM {table} GROUP BY md5(text)
""".strip()


def dd_minhash_sig_cte() -> str:
    mh_hash = dd_h64("seed::VARCHAR || '#' || s")
    return f"""
sig AS (
  SELECT doc_id, seed, min({mh_hash}) AS mh
  FROM sh CROSS JOIN (SELECT unnest(range({MINHASH_NUM})) AS seed)
  GROUP BY doc_id, seed
)
""".strip()


def dd_dedup_minhash_lsh_sql(table: str = "documents") -> str:
    return f"""
WITH {dd_doc_shingles_cte(table)},
{dd_minhash_sig_cte()},
bands AS (
  SELECT doc_id, (seed // {MINHASH_ROWS})::INT AS band,
         md5(string_agg(mh::VARCHAR, ',' ORDER BY seed)) AS bsig
  FROM sig GROUP BY doc_id, band
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id
),
est AS (
  SELECT c.doc_a, c.doc_b,
         round(avg(CASE WHEN sa.mh = sb.mh THEN 1.0 ELSE 0.0 END), {SCORE_ROUND}) AS est_jaccard
  FROM cand c
  JOIN sig sa ON sa.doc_id = c.doc_a
  JOIN sig sb ON sb.doc_id = c.doc_b AND sa.seed = sb.seed
  GROUP BY c.doc_a, c.doc_b
)
SELECT doc_a, doc_b, est_jaccard FROM est WHERE est_jaccard >= {JACCARD_THRESHOLD}
""".strip()


def dd_dedup_minhash_lsh_bounded_sql(table: str = "documents",
                                     cap: int = LSH_BUCKET_CAP) -> str:
    """Oracle twin of :func:`dedup_minhash_lsh_bounded`: same band CTEs,
    plus per-bucket size/hub; all-pairs for buckets <= cap, star pairs
    to the hub above; the shared est CTE and threshold."""
    return f"""
WITH {dd_doc_shingles_cte(table)},
{dd_minhash_sig_cte()},
bands AS (
  SELECT doc_id, (seed // {MINHASH_ROWS})::INT AS band,
         md5(string_agg(mh::VARCHAR, ',' ORDER BY seed)) AS bsig
  FROM sig GROUP BY doc_id, band
),
bstats AS (
  SELECT band, bsig, count(*)::BIGINT AS bsz, min(doc_id) AS hub
  FROM bands GROUP BY band, bsig
),
cand AS (
  SELECT DISTINCT doc_a, doc_b FROM (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM bands a
    JOIN bands b ON a.band = b.band AND a.bsig = b.bsig
                AND a.doc_id < b.doc_id
    JOIN bstats s ON s.band = a.band AND s.bsig = a.bsig
    WHERE s.bsz <= {cap}
    UNION ALL
    SELECT s.hub AS doc_a, b.doc_id AS doc_b
    FROM bands b
    JOIN bstats s ON s.band = b.band AND s.bsig = b.bsig
    WHERE s.bsz > {cap} AND b.doc_id != s.hub
  )
),
est AS (
  SELECT c.doc_a, c.doc_b,
         round(avg(CASE WHEN sa.mh = sb.mh THEN 1.0 ELSE 0.0 END), {SCORE_ROUND}) AS est_jaccard
  FROM cand c
  JOIN sig sa ON sa.doc_id = c.doc_a
  JOIN sig sb ON sb.doc_id = c.doc_b AND sa.seed = sb.seed
  GROUP BY c.doc_a, c.doc_b
)
SELECT doc_a, doc_b, est_jaccard FROM est WHERE est_jaccard >= {JACCARD_THRESHOLD}
""".strip()


def dd_dedup_ngram_jaccard_sql(table: str = "documents") -> str:
    return f"""
WITH {dd_doc_shingles_cte(table)},
sizes AS (SELECT doc_id, count(*)::BIGINT AS n FROM sh GROUP BY doc_id),
co AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*)::BIGINT AS c
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id
)
SELECT doc_a, doc_b,
       round(c * 1.0 / (sa.n + sb.n - c), {SCORE_ROUND}) AS jaccard
FROM co JOIN sizes sa ON co.doc_a = sa.doc_id
        JOIN sizes sb ON co.doc_b = sb.doc_id
WHERE round(c * 1.0 / (sa.n + sb.n - c), {SCORE_ROUND}) >= {JACCARD_THRESHOLD}
""".strip()


def dd_simhash_sql(table: str = "documents") -> str:
    h = dd_h64("term")
    bit_sums = ",\n         ".join(
        f"sum(CASE WHEN (h >> {j}) & 1 = 1 THEN tf ELSE -tf END) AS b{j}"
        for j in range(SIMHASH_BITS)
    )
    combine = " + ".join(
        f"CASE WHEN b{j} > 0 THEN {2**j}::BIGINT ELSE 0::BIGINT END"
        for j in range(SIMHASH_BITS)
    )
    return f"""
WITH tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf, {h} AS h
  FROM (SELECT doc_id, unnest({dd_tokenize('text')}) AS term FROM {table})
  GROUP BY doc_id, term
),
bit_sums AS (
  SELECT doc_id,
         {bit_sums}
  FROM tf GROUP BY doc_id
)
SELECT doc_id, ({combine}) AS simhash FROM bit_sums
""".strip()


# Write-time multi-probe width (r11 VERDICT #2; widened r13 per r12
# VERDICT #5). Priced at sf0.01/sf0.001 vs the exact pair set
# (PERF_NOTES r13): p=1 0.41/0.26, p=2 0.71/0.64, p=3 0.92/0.92,
# p=4 1.00/1.00. p=3 is the operating point: it clears the >=0.8
# recall bar SemDeDup-class production sweeps want, at pair-space
# ~(3/2)^2 = 2.25x over p=2 — still ~p^2*N^1.5/2, never all-pairs;
# p=4's exactness on these corpora is a small-N artifact (pair space
# keeps growing p^2 while recall saturates).
DEDUP_IVF_NPROBE = 3


def dedup_embedding_ivf(emb: DataFrame,
                        cells: DataFrame | None = None,
                        nprobe: int = DEDUP_IVF_NPROBE,
                        threshold: float = COSINE_DUP_THRESHOLD) -> DataFrame:
    """Cell-BUCKETED embedding near-dups >= COSINE_DUP_THRESHOLD — the
    approximate scale path dedup_embedding_cosine's docstring points at:
    candidate pairs are restricted to vectors sharing an IVF cell
    (operators/knn.ivf_assign — the same frozen derived-nlist centroid
    assignment the ANN layouts persist), so the pair space shrinks from
    N^2/2 to ~nprobe^2 * N^2/(2*nlist) = ~nprobe^2 * N^1.5/2 at
    nlist ~ sqrt(N), one shuffle on the cell key, cosine evaluated
    JVM-side. Each vector lives in its top-``nprobe`` cells (multi-probe
    assignment, r12; widened to top-3 in r13 — single-probe lost
    near-dup pairs straddling a cell boundary at recall 0.41 at sf0.01,
    top-2 reached 0.71, top-3 reaches 0.92, the >=0.8 production bar;
    price table in PERF_NOTES), so a pair co-located in MORE than one shared cell would be
    emitted once per cell — the final distinct collapses those (cos_sim
    is deterministic per pair, so distinct on all three columns is
    exact). A true near-dup pair is found iff some probe cell co-locates
    it (tests record the recall vs the exact block-GEMM pair set);
    remaining misses are the documented price of bucketing, exactly
    SemDeDup's trade.

    Output: vec_a, vec_b, cos_sim (vec_a < vec_b) — the same contract as
    dedup_embedding_cosine, so downstream survivorship/components
    consume either.
    """
    from .knn import ivf_assign

    if cells is None:
        # in-plan assignment (oracle-exact, via the single-source
        # ivf_assign rule); the registered query passes the persisted
        # multiprobe layout frame instead — its (vec_id, embedding,
        # cell) rows are already CO-LOCATED on disk, so the probe is
        # one three-column scan with no assignment crossJoin and no
        # re-join of the embeddings table
        _, assign = ivf_assign(emb, p=nprobe)
        cells = emb.join(assign, emb["vec_id"] == assign["c_id"]).select(
            "vec_id", "embedding", "cell"
        )
    # r15: the within-cell pair stage is ONE applyInPandas over
    # groupBy(cell) — a row-blocked numpy GEMM per cell (the
    # _embedding_pairs_gemm / _semdedup_with_centroids convention:
    # L2-normalize rows, np.round at SCORE_ROUND, threshold mask). The
    # pre-r15 form self-joined the cells frame on cell (two exchanges of
    # the layout scan) and paid the interpreted CodegenFallback HOF
    # cosine per candidate pair (~p^2*N^1.5/2 pairs); same pair set,
    # same rounding, the final distinct still collapses pairs
    # co-located in more than one shared cell.
    import numpy as np
    import pandas as pd

    def cell_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["vec_id"].to_numpy()
        X = np.stack(pdf["embedding"].to_numpy()).astype("float64")
        X /= np.linalg.norm(X, axis=1, keepdims=True)
        n = len(ids)
        bs = 2048  # bounds the sim block at bs x cell_size doubles
        out_a, out_b, out_s = [], [], []
        for s in range(0, n, bs):
            e = min(s + bs, n)
            sims = np.round(X[s:e] @ X.T, SCORE_ROUND)
            mask = (sims >= threshold) & (ids[s:e, None] < ids[None, :])
            ai, bi = np.nonzero(mask)
            out_a.append(ids[s:e][ai])
            out_b.append(ids[bi])
            out_s.append(sims[ai, bi])
        return pd.DataFrame({
            "vec_a": np.concatenate(out_a) if out_a else
            np.array([], dtype="int64"),
            "vec_b": np.concatenate(out_b) if out_b else
            np.array([], dtype="int64"),
            "cos_sim": np.concatenate(out_s) if out_s else
            np.array([], dtype="float64"),
        })

    return (
        cells.groupBy("cell")
        .applyInPandas(cell_pairs, "vec_a long, vec_b long, cos_sim double")
        .distinct()
    )


def dd_dedup_embedding_ivf_sql(table: str = "embeddings",
                               nprobe: int = DEDUP_IVF_NPROBE) -> str:
    """Oracle twin: the dd_ivf_topk_sql assignment CTEs (rn <= nprobe —
    the multi-probe widening) + a within-cell self-join at the shared
    threshold, DISTINCT collapsing pairs co-located in two shared
    cells."""
    from .knn import dd_centroid_pred

    csim = dd_cosine_similarity("e.c_vec", "c.cvec")
    cs = dd_cosine_similarity("x.embedding", "y.embedding")
    return f"""
WITH cent AS (
  SELECT vec_id AS cent_id, embedding AS cvec FROM {table}
  WHERE {dd_centroid_pred('vec_id', table)}
),
e AS (SELECT vec_id AS c_id, embedding AS c_vec FROM {table}),
assign AS (
  SELECT c_id, cent_id AS cell FROM (
    SELECT e.c_id, c.cent_id,
           row_number() OVER (PARTITION BY e.c_id
             ORDER BY round({csim}, {SCORE_ROUND}) DESC, c.cent_id ASC) AS rn
    FROM e CROSS JOIN cent c
  ) WHERE rn <= {nprobe}
),
cells AS (
  SELECT a.c_id AS vec_id, e2.c_vec AS embedding, a.cell
  FROM assign a JOIN e e2 ON e2.c_id = a.c_id
)
SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b,
       round({cs}, {SCORE_ROUND}) AS cos_sim
FROM cells x JOIN cells y ON x.cell = y.cell AND x.vec_id < y.vec_id
WHERE round({cs}, {SCORE_ROUND}) >= {COSINE_DUP_THRESHOLD}
""".strip()


def dd_dedup_embedding_cosine_sql(table: str = "embeddings") -> str:
    cs = dd_cosine_similarity("a.embedding", "b.embedding")
    return f"""
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round({cs}, {SCORE_ROUND}) AS cos_sim
FROM {table} a JOIN {table} b ON a.vec_id < b.vec_id
WHERE round({cs}, {SCORE_ROUND}) >= {COSINE_DUP_THRESHOLD}
""".strip()


#: near-dup threshold on WHITENED cosine. Raw cosine on all-positive
#: embedding data is inflated by the common mean direction (anisotropy:
#: every pair of uniform-[0,1] vectors scores ~0.75, so the raw 0.4
#: threshold is meaningless there and COSINE_DUP_THRESHOLD only works
#: because the synthetic corpus is centered); after per-dimension
#: standardization, cosine is ~N(0, 1/D), so a fixed threshold has a
#: stable sigma meaning — 0.4 is 3.2 sigma at D=64, sized so the
#: whitened pair set (50 at sf0.01) matches the raw set's scale (59).
WHITEN_DUP_THRESHOLD = 0.4


def whiten_stats(emb: DataFrame,
                 strategy: str = "partials") -> tuple[list[float], list[float]]:
    """Per-dimension (mu, sd) of the embedding corpus, rounded to
    SCORE_ROUND (so the SQL oracle's independently-summed moments agree
    at the digits that matter); zero-variance dimensions get sd 1.

    Two value-identical strategies (pinned in
    tests/test_embedding_whitening.py):

    - ``"partials"`` (default — r13 VERDICT What's-wrong #4): each
      partition reduces to D rows of (i, sx, sxx, n) via one Arrow
      mapInPandas pass — the embeddings_covariance diagonal — and a
      map-side-combined groupBy finishes mu = sx/n,
      sd = sqrt(sxx/n - mu²). Shuffle volume is D rows PER PARTITION,
      independent of N, and the plan carries D aggregate rows instead
      of 2·D codegen aggregate COLUMNS — at a production D=1024 the
      expression form compiles 2048 aggregate expressions into one
      stage, which is exactly the codegen-width hazard the covariance
      operator was built to avoid.
    - ``"expressions"`` — the original 2·D-column catalyst aggregate,
      kept as the parity pin target.
    """
    first = emb.select(F.size("embedding").alias("d")).first()
    if first is None:
        return [], []
    dim = int(first["d"])
    if strategy == "expressions":
        aggs = []
        for j in range(dim):
            c = F.col("embedding").getItem(j).cast("double")
            aggs.append(F.round(F.avg(c), SCORE_ROUND).alias(f"m{j}"))
            aggs.append(F.round(F.stddev_pop(c), SCORE_ROUND).alias(f"s{j}"))
        row = emb.agg(*aggs).first()
        mu = [float(row[f"m{j}"]) for j in range(dim)]
        sd = [float(row[f"s{j}"]) or 1.0 for j in range(dim)]
        return mu, sd
    if strategy != "partials":
        raise ValueError(f"unknown whiten_stats strategy: {strategy!r}")
    import math

    import numpy as np
    import pandas as pd

    def partials(batches):
        sx = np.zeros(dim, dtype=np.float64)
        sxx = np.zeros(dim, dtype=np.float64)
        n = 0
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.array(pdf["embedding"].tolist(), dtype=np.float64)
            sx += X.sum(axis=0)
            sxx += (X * X).sum(axis=0)
            n += len(X)
        if n == 0:
            return
        yield pd.DataFrame({
            "i": np.arange(dim, dtype=np.int32),
            "sx": sx, "sxx": sxx,
            "n": np.full(dim, n, dtype=np.int64),
        })

    rows = (
        emb.select("embedding")
        .mapInPandas(partials, "i int, sx double, sxx double, n long")
        .groupBy("i")
        .agg(F.sum("sx").alias("sx"), F.sum("sxx").alias("sxx"),
             F.sum("n").alias("n"))
        .collect()
    )
    mu = [0.0] * dim
    sd = [1.0] * dim
    for r in rows:
        m = r["sx"] / r["n"]
        var = max(r["sxx"] / r["n"] - m * m, 0.0)
        mu[r["i"]] = round(m, SCORE_ROUND)
        sd[r["i"]] = round(math.sqrt(var), SCORE_ROUND) or 1.0
    return mu, sd


def apply_whitening(emb: DataFrame, mu: list[float],
                    sd: list[float]) -> DataFrame:
    """(vec_id, embedding) standardized against FROZEN per-dimension
    moments — the JVM-side array rebuild shared by the one-shot whiten
    and the persisted-layout append path (frozen-stats contract, like
    the IVF layouts' frozen centroids)."""
    z = F.array(*[
        (F.col("embedding").getItem(j).cast("double") - F.lit(mu[j]))
        / F.lit(sd[j])
        for j in range(len(mu))
    ])
    return emb.select("vec_id", z.alias("embedding"))


def whiten_embeddings(emb: DataFrame,
                      strategy: str = "partials") -> DataFrame:
    """(vec_id, embedding) with each dimension standardized:
    z_j = (x_j - mu_j) / sd_j over the corpus — DIAGONAL whitening, the
    anisotropy correction semantic-dedup pipelines apply before
    trusting cosine (common-direction energy otherwise dominates every
    similarity; see embeddings_covariance for the full matrix). Moments
    come from one bounded pass (see :func:`whiten_stats` — D Arrow
    partial rows per partition by default), then a JVM-side array
    rebuild — no Python in the N-row path."""
    mu, sd = whiten_stats(emb, strategy=strategy)
    if not mu:
        return emb.select("vec_id", "embedding")
    return apply_whitening(emb, mu, sd)


def dedup_embedding_whitened(emb: DataFrame,
                             num_blocks: int = 8) -> DataFrame:
    """Embedding near-dups >= WHITEN_DUP_THRESHOLD on the diagonally
    WHITENED vectors — dedup_embedding_cosine's exact blocked-GEMM
    machinery over whiten_embeddings' output (same pair contract:
    vec_a < vec_b, cos_sim), so downstream survivorship/components
    consume it unchanged. The scale shape is identical (one stats
    aggregate + the O(N*B) block shuffle); what changes is WHICH pairs
    clear the bar: anisotropic common-direction energy no longer
    manufactures similarity."""
    z = whiten_embeddings(emb)
    return _embedding_pairs_gemm(z, num_blocks, WHITEN_DUP_THRESHOLD)


def dd_dedup_embedding_whitened_sql(table: str = "embeddings") -> str:
    """Oracle twin: per-dimension moments as scalars (rounded at the
    same digit as the Spark side), list_transform standardization, the
    shared cosine formula, the whitened threshold."""
    cs = dd_cosine_similarity("a.embedding", "b.embedding")
    return f"""
WITH stats AS (
  SELECT i, round(avg(v), {SCORE_ROUND}) AS mu,
         round(stddev_pop(v), {SCORE_ROUND}) AS sd
  FROM (SELECT i, embedding[i + 1]::DOUBLE AS v
        FROM {table}, unnest(range(0, len(embedding))) t(i))
  GROUP BY i
),
sarr AS (
  SELECT list(mu ORDER BY i) AS mu,
         list(CASE WHEN sd = 0 THEN 1.0 ELSE sd END ORDER BY i) AS sd
  FROM stats
),
z AS (
  SELECT vec_id,
         list_transform(range(1, len(embedding) + 1),
                        k -> (embedding[k]::DOUBLE - mu[k]) / sd[k])
           AS embedding
  FROM {table} CROSS JOIN sarr
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       round({cs}, {SCORE_ROUND}) AS cos_sim
FROM z a JOIN z b ON a.vec_id < b.vec_id
WHERE round({cs}, {SCORE_ROUND}) >= {WHITEN_DUP_THRESHOLD}
""".strip()


def dd_dedup_embedding_ivf_whitened_sql(table: str = "embeddings",
                                        nprobe: int = DEDUP_IVF_NPROBE) -> str:
    """Oracle twin of the WHITENED cell-bucketed dedup: the
    dd_dedup_embedding_whitened_sql standardization CTEs feeding the
    dd_dedup_embedding_ivf_sql assignment CTEs — centroids are the
    id-stride sample OF THE WHITENED vectors (the build whitens first,
    then writes the multiprobe layout over z), cells assigned by
    whitened cosine (rn <= nprobe), within-cell pairs thresholded at
    WHITEN_DUP_THRESHOLD."""
    from .knn import dd_centroid_pred

    csim = dd_cosine_similarity("e.c_vec", "c.cvec")
    cs = dd_cosine_similarity("x.embedding", "y.embedding")
    return f"""
WITH stats AS (
  SELECT i, round(avg(v), {SCORE_ROUND}) AS mu,
         round(stddev_pop(v), {SCORE_ROUND}) AS sd
  FROM (SELECT i, embedding[i + 1]::DOUBLE AS v
        FROM {table}, unnest(range(0, len(embedding))) t(i))
  GROUP BY i
),
sarr AS (
  SELECT list(mu ORDER BY i) AS mu,
         list(CASE WHEN sd = 0 THEN 1.0 ELSE sd END ORDER BY i) AS sd
  FROM stats
),
z AS (
  SELECT vec_id,
         list_transform(range(1, len(embedding) + 1),
                        k -> (embedding[k]::DOUBLE - mu[k]) / sd[k])
           AS embedding
  FROM {table} CROSS JOIN sarr
),
cent AS (
  SELECT vec_id AS cent_id, embedding AS cvec FROM z
  WHERE {dd_centroid_pred('vec_id', table)}
),
e AS (SELECT vec_id AS c_id, embedding AS c_vec FROM z),
assign AS (
  SELECT c_id, cent_id AS cell FROM (
    SELECT e.c_id, c.cent_id,
           row_number() OVER (PARTITION BY e.c_id
             ORDER BY round({csim}, {SCORE_ROUND}) DESC, c.cent_id ASC) AS rn
    FROM e CROSS JOIN cent c
  ) WHERE rn <= {nprobe}
),
cells AS (
  SELECT a.c_id AS vec_id, e2.c_vec AS embedding, a.cell
  FROM assign a JOIN e e2 ON e2.c_id = a.c_id
)
SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b,
       round({cs}, {SCORE_ROUND}) AS cos_sim
FROM cells x JOIN cells y ON x.cell = y.cell AND x.vec_id < y.vec_id
WHERE round({cs}, {SCORE_ROUND}) >= {WHITEN_DUP_THRESHOLD}
""".strip()


# --- duplicate-group resolution (connected components) -----------------------


def dedup_components(docs: DataFrame, max_iter: int = 25,
                     pairs: DataFrame | None = None,
                     stats: dict | None = None) -> DataFrame:
    """Resolve near-dup PAIRS into duplicate GROUPS: connected components
    over the minhash-LSH candidate graph, by iterative min-label
    propagation (the keep-one-per-group primitive every dedup pipeline
    ends with). ``pairs`` injects an explicit (doc_a, doc_b) edge frame
    (the crossover-probe seam, same as dedup_components_star's);
    ``stats`` when passed receives {"rounds": n} for the measurement
    tools — n only ever crosses the driver as this one scalar.

    Each iteration is one join + min-aggregate — the Pregel message
    pattern on DataFrames; the loop exits as soon as no label improves.
    Iterations are bounded by the component diameter, which for near-dup
    clusters is tiny (dup groups are dense). At extreme scale swap the
    propagation for the large-star/small-star algorithm (same API); the
    driver only ever sees the per-round convergence COUNT, never rows.

    Output: doc_id, component_id (= min doc_id reachable), for every doc
    that appears in at least one near-dup pair.
    """
    if pairs is None:
        pairs = dedup_minhash_lsh(docs).select("doc_a", "doc_b")
    sym = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    # Two iterative-loop disciplines, both essential:
    # 1. localCheckpoint truncates LINEAGE each round — the round-N logical
    #    plan otherwise contains 4 copies of round N-1 (union of labels +
    #    msgs(labels) + jump(labels, labels)), and Catalyst re-analysis
    #    goes exponential (measured: round 1 alone cost 8.8s at sf0.1).
    # 2. partitioning sized to the PAIR GRAPH, which LSH keeps orders of
    #    magnitude smaller than the corpus — not the corpus-shaped default.
    edges = sym.localCheckpoint()
    n_edges = edges.count()
    npart = max(1, min(200, n_edges // 100_000 + 1))
    edges = edges.repartition(npart, "src")
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    # r14 convergence check: labels are MONOTONE non-increasing per node
    # (each round takes a min that includes the node's own old label) and
    # the node set is fixed, so the label sum strictly decreases exactly
    # when any label improves. decimal(38,0): summing billions of 60-bit
    # ids overflows a long. The per-round repartition(npart) after the
    # groupBy is gone too: the aggregate already hash-partitions by node
    # and AQE sizes the partitions, so it was a pure extra exchange.
    # r15: the sum rides the checkpoint job as an OBSERVATION
    # (CollectMetrics accumulators) instead of a second per-round
    # aggregate job — one Spark job per round, identical decimal value.
    from pyspark.sql import Observation

    def _sum_expr():
        return F.sum(F.col("label").cast("decimal(38,0)")).alias("s")

    def _observed_ckpt(lb: DataFrame):
        obs = Observation()
        ckpt = lb.observe(obs, _sum_expr()).localCheckpoint()
        return ckpt, obs.get["s"]

    prev_sum = labels.agg(_sum_expr()).collect()[0]["s"]
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        msgs = edges.join(
            labels, edges["src"] == labels["node"]
        ).select(F.col("dst").alias("node"), "label")
        # pointer jumping (label <- label's label) halves the remaining
        # diameter each round: O(log D) rounds instead of O(D)
        jump = labels.alias("x").join(
            labels.select(
                F.col("node").alias("jn"), F.col("label").alias("jl")
            ),
            F.col("x.label") == F.col("jn"),
        ).select(F.col("x.node").alias("node"), F.col("jl").alias("label"))
        new_labels = (
            labels.unionByName(msgs)
            .unionByName(jump)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        new_labels, new_sum = _observed_ckpt(new_labels)
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    if stats is not None:
        stats["rounds"] = rounds
    return labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("component_id")
    )


def dedup_components_star(docs: DataFrame, max_iter: int = 50,
                          pairs: DataFrame | None = None,
                          stats: dict | None = None) -> DataFrame:
    """Connected components by alternating LARGE-STAR / SMALL-STAR
    rounds (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC 2014) — the extreme-scale path dedup_components'
    docstring points at, same API and the same min-id labels.

    Why it scales past the label-propagation loop: each round is two
    edge-set transforms (a per-node min aggregate + one join), the
    state is the EDGE SET itself (never a separate label table being
    unioned three ways), the edge count never grows beyond O(E), and
    the paper proves O(log n) rounds to a fixpoint where every
    component is a star centered on its min id. Label propagation with
    pointer jumping matches the round bound but carries a
    3-way-unioned label table per round; here the per-round plan is
    strictly two aggregates over edges — the shape that holds when the
    pair graph itself is billions of edges.

    large-star: orient every edge both ways, m(u) = min(N(u) ∪ {u});
    connect every LARGER neighbor of u to m(u).
    small-star: orient edges to the larger endpoint, m(u) = min of u's
    smaller neighbors (∪ {u}); connect u and its smaller neighbors to
    m(u). Fixpoint = disjoint stars; labels read straight off the
    edges. Convergence is detected with a bounded (count, hash-sum)
    signature — nothing but 2-value rows cross the driver — and then
    CONFIRMED with an exact multiset identity check (one bounded
    exceptAll over the pair graph), so a hash-sum collision between two
    different edge sets can never silently read labels off a
    non-fixpoint state; exhausting ``max_iter`` without a verified
    fixpoint raises instead of returning unverified labels (both r12
    ADVICE findings — the star extraction below is only valid at the
    proven fixpoint).

    Output: doc_id, component_id — equal row-for-row to
    dedup_components (pinned in tests/test_dedup_strategies.py).
    ``pairs`` injects an explicit (doc_a, doc_b) edge frame instead of
    the LSH candidate graph — the testing seam for adversarial shapes
    (long chains, stars, bridges) the LSH graph of a real corpus never
    produces on demand.
    """
    from pyspark.sql import Window

    if pairs is None:
        pairs = dedup_minhash_lsh(docs).select("doc_a", "doc_b")
    edges = (
        pairs.select(F.least("doc_a", "doc_b").alias("src"),
                     F.greatest("doc_a", "doc_b").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )
    spark = pairs.sparkSession
    if edges.isEmpty():
        return spark.createDataFrame(
            [], "doc_id long, component_id long")

    def _sig(e: DataFrame) -> tuple:
        # r14: no .distinct() here — every frame signed is already
        # row-distinct with a fixed orientation (the initial edges by
        # construction, every later one a _small_star output ending in
        # .distinct()), and the least/greatest normalization of a
        # consistently-oriented distinct set stays distinct, so the old
        # distinct was a whole extra shuffle per round for nothing.
        row = (
            e.select(F.least("src", "dst").alias("a"),
                     F.greatest("src", "dst").alias("b"))
            .agg(F.count(F.lit(1)).alias("n"),
                 # decimal(38,0): a long sum of 64-bit hashes overflows
                 # under ANSI mode on the first few million edges
                 F.sum(F.xxhash64("a", "b").cast("decimal(38,0)"))
                 .alias("h"))
            .collect()[0]
        )
        return (row["n"], row["h"])

    # r14: both star transforms compute the per-node min with a WINDOW
    # over the partitioning key instead of groupBy + self-join — one
    # shuffle of the edge set per transform instead of two (the join
    # re-shuffled the full symmetric/oriented set a second time). Same
    # emitted edge set row for row: the window min over a partition IS
    # the group min attached to every member row.
    def _large_star(e: DataFrame) -> DataFrame:
        sym = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        w = Window.partitionBy("src")
        m = F.least(F.min("dst").over(w), F.col("src"))
        return (
            sym.select("src", "dst", m.alias("m"))
            .where(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
            .distinct()
        )

    def _small_star(e: DataFrame) -> DataFrame:
        d = e.select(F.greatest("src", "dst").alias("u"),
                     F.least("src", "dst").alias("v")).distinct()
        w = Window.partitionBy("u")
        dd = d.select("u", "v", F.min("v").over(w).alias("m"))
        # per row emit (v, m) [the member edge, dropped when v == m]
        # and (u, m) [the hub edge, deduped by the final distinct] —
        # exactly the join+union emission of the r13 form
        return (
            dd.select(
                F.explode(
                    F.array(
                        F.struct(F.col("v").alias("src"),
                                 F.col("m").alias("dst")),
                        F.struct(F.col("u").alias("src"),
                                 F.col("m").alias("dst")),
                    )
                ).alias("e")
            )
            .select("e.src", "e.dst")
            .where(F.col("src") != F.col("dst"))
            .distinct()
        )

    sig = _sig(edges)
    converged = False
    rounds = 0
    # r15: the per-round signature rides the checkpoint job as an
    # OBSERVATION (one Spark job per round instead of ckpt + a separate
    # signature aggregate); the (count, decimal hash-sum) values are the
    # exact _sig expressions, and the exceptAll fixpoint CONFIRMATION
    # below is unchanged.
    from pyspark.sql import Observation

    for _ in range(max_iter):
        rounds += 1
        # lineage discipline: same rule as dedup_components — each
        # round materializes, or Catalyst re-analysis goes exponential
        obs = Observation()
        new_edges = _small_star(_large_star(edges)).observe(
            obs,
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.xxhash64(F.least("src", "dst"), F.greatest("src", "dst"))
                .cast("decimal(38,0)")
            ).alias("h"),
        ).localCheckpoint()
        row = obs.get
        new_sig = (row["n"], row["h"])
        if new_sig == sig:
            # signature equality is necessary, not sufficient (equal
            # count + colliding hash sums is astronomically unlikely
            # but would be a SILENT wrong answer): confirm the fixpoint
            # exactly — equal counts + empty one-direction exceptAll
            # means the distinct edge multisets are identical. Note
            # both frames are _small_star outputs, so row orientation
            # matches; the first round can never signature-match the
            # (src<dst)-oriented input for the same reason.
            if new_edges.exceptAll(edges).isEmpty():
                edges = new_edges
                converged = True
                break
        sig = new_sig
        edges = new_edges
    if not converged:
        raise ValueError(
            f"dedup_components_star did not reach a verified fixpoint "
            f"in {max_iter} rounds: the star extraction is only valid "
            "at the proven fixpoint, so returning labels here would be "
            "a silent wrong answer. The paper bounds rounds at "
            "O(log n) — raise max_iter for a genuinely deeper graph."
        )
    if stats is not None:
        stats["rounds"] = rounds
    # fixpoint = stars (u -> component min m): every non-root node has
    # exactly one star edge; roots appear only as dst
    stars = edges.select(F.greatest("src", "dst").alias("doc_id"),
                         F.least("src", "dst").alias("component_id"))
    roots = stars.select(
        F.col("component_id").alias("doc_id"),
        F.col("component_id").alias("component_id"),
    ).distinct()
    return stars.unionByName(roots).distinct()


def dd_dedup_components_sql(table: str = "documents") -> str:
    """Recursive-CTE transitive closure: min reachable id per node —
    exactly the fixpoint the Spark propagation converges to."""
    return f"""
WITH RECURSIVE pairs AS (
  {dd_dedup_minhash_lsh_sql(table)}
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
nodes AS (SELECT DISTINCT src AS node FROM edges),
reach(node, label) AS (
  SELECT node, node FROM nodes
  UNION
  SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.node
)
SELECT node AS doc_id, min(label) AS component_id FROM reach GROUP BY node
""".strip()


def dedup_survivorship(docs: DataFrame) -> DataFrame:
    """Quality-aware survivorship: per exact-duplicate group keep the
    HIGHEST-quality member (ties -> lowest doc_id), not the arbitrary
    min-id — the rule real curation pipelines apply when near-identical
    docs differ in cleanliness.

    Shape: the quality table (textstats.quality_scores, exact integer
    arithmetic) joins the fingerprint projection on doc_id, then ONE
    hash aggregate per fingerprint taking max(struct(quality, -doc_id))
    — an aggregate, not a per-group window, so a pathological
    billion-copy group still partial-aggregates map-side instead of
    sorting one partition.
    """
    from .textstats import quality_scores

    fps = docs.select(F.md5(F.col("text")).alias("fp"), "doc_id")
    q = quality_scores(docs).select("doc_id", "quality")
    j = fps.join(q, "doc_id")
    best = F.max(
        F.struct(
            F.col("quality").alias("q"), (-F.col("doc_id")).alias("nid")
        )
    )
    return (
        j.groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            (-best.getField("nid")).cast("long").alias("keep_id"),
        )
    )


def dd_dedup_survivorship_sql(table: str = "documents") -> str:
    from .textstats import dd_quality_scores_sql

    return f"""
WITH q AS ({dd_quality_scores_sql(table)}),
fps AS (SELECT md5(text) AS fp, doc_id FROM {table})
SELECT fp, count(*)::BIGINT AS cnt,
       (-(max(struct_pack(q := quality, nid := -doc_id)).nid))::BIGINT
         AS keep_id
FROM fps JOIN q USING (doc_id)
GROUP BY fp
""".strip()


def near_dup_rate_by_source(docs: DataFrame) -> DataFrame:
    """Dataset-quality diagnostic: where do near-duplicates come from?
    Aggregates the minhash-LSH pair set by (source_a, source_b) — pair
    counts, mean estimated Jaccard, and the share of each source's docs
    involved — so a pipeline can see which feeds re-crawl each other.

    The pair table is the LSH output (bucket-local, never N²); the two
    source lookups join on doc ids; source pairs are canonicalized
    (least, greatest) so the matrix is upper-triangular.
    """
    pairs = dedup_minhash_lsh(docs)
    src = docs.select("doc_id", "source")
    j = (
        pairs.join(
            src.withColumnRenamed("doc_id", "doc_a")
            .withColumnRenamed("source", "src_a"),
            "doc_a",
        )
        .join(
            src.withColumnRenamed("doc_id", "doc_b")
            .withColumnRenamed("source", "src_b"),
            "doc_b",
        )
        .select(
            F.least("src_a", "src_b").alias("source_a"),
            F.greatest("src_a", "src_b").alias("source_b"),
            "est_jaccard",
        )
    )
    return (
        j.groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.round(F.avg("est_jaccard"), SCORE_ROUND).alias("mean_jaccard"),
        )
        .orderBy("source_a", "source_b")
    )


def dd_near_dup_rate_by_source_sql(table: str = "documents") -> str:
    return f"""
WITH pairs AS ({dd_dedup_minhash_lsh_sql(table)}),
j AS (
  SELECT least(da.source, db.source) AS source_a,
         greatest(da.source, db.source) AS source_b,
         p.est_jaccard
  FROM pairs p
  JOIN {table} da ON da.doc_id = p.doc_a
  JOIN {table} db ON db.doc_id = p.doc_b
)
SELECT source_a, source_b, count(*)::BIGINT AS n_pairs,
       round(avg(est_jaccard), {SCORE_ROUND}) AS mean_jaccard
FROM j GROUP BY source_a, source_b ORDER BY source_a, source_b
""".strip()


# --- near-dup graph PageRank -------------------------------------------------

PR_ITERS = 8
PR_DAMPING = 0.85
PR_ROUND = 6


def dedup_graph_pagerank(docs: DataFrame) -> DataFrame:
    """PageRank centrality over the minhash-LSH near-dup graph: which
    documents sit at the CENTER of duplication clusters (canonical-copy
    candidates — survivorship by centrality instead of quality score).

    Power iteration on DataFrames: per round one (edges ⋈ ranks) join +
    one dst-keyed sum — the standard distributed PageRank shape, damping
    mass redistributed uniformly over the graph's nodes. Same loop
    disciplines as dedup_components: localCheckpoint per round (lineage
    truncation) and partitioning sized to the LSH pair graph, not the
    corpus. Driver sees only the node count and top rows. Deterministic:
    fixed PR_ITERS power iterations, no convergence randomness.

    Output: the top-20 docs by rank (rank desc, doc_id asc) with their
    degree. ORACLED despite being iterative: PR_ITERS is fixed, so the
    DuckDB twin unrolls the power iteration as PR_ITERS chained CTEs
    with the identical per-round formula (base + damping * sum(rank/deg))
    -- final ranks agree to well inside the 6-dp output rounding.
    """
    pairs = dedup_minhash_lsh(docs).select("doc_a", "doc_b")
    sym = pairs.select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    ).unionByName(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    )
    from pyspark.sql import Window

    edges = sym.localCheckpoint()
    n_edges = edges.count()
    npart = max(1, min(200, n_edges // 100_000 + 1))
    edges = edges.repartition(npart, "src")

    # degree is loop-invariant: attach it to the edge table ONCE so each
    # round is a single join + aggregate instead of two joins. r15: the
    # degree is a window count over the src partitioning (one shuffle of
    # the edge set instead of groupBy + self-join — the r14 star-rounds
    # pattern), and the node table derives from the checkpointed
    # edges_deg instead of its own checkpoint job; the trivial initial
    # ranks projection is no longer checkpointed either (2 fewer
    # pre-loop jobs, same values).
    edges_deg = edges.select(
        "src", "dst",
        F.count(F.lit(1)).over(Window.partitionBy("src")).alias("deg"),
    ).localCheckpoint()
    nodes = edges_deg.select(
        F.col("src").alias("node"), "deg"
    ).distinct()
    n_nodes = nodes.count()
    if n_nodes == 0:
        return docs.sparkSession.createDataFrame(
            [], "doc_id long, rank double, deg long"
        )
    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    base = (1.0 - PR_DAMPING) / n_nodes
    for it in range(PR_ITERS):
        contrib = (
            edges_deg.join(ranks.select(F.col("node").alias("rn"), "rank"),
                           F.col("src") == F.col("rn"))
            .select(F.col("dst").alias("node"),
                    (F.col("rank") / F.col("deg")).alias("c"))
        )
        ranks = (
            contrib.groupBy("node")
            .agg(F.sum("c").alias("in_mass"))
            .select(
                "node",
                (F.lit(base) + F.lit(PR_DAMPING) * F.col("in_mass"))
                .alias("rank"),
            )
        )
        # per-round checkpoint, like dedup_components: although ranks
        # feeds the next round only once (linear lineage, no 4-way
        # blowup), measured at sf0.1 a depth-4 uncheckpointed chain
        # DOUBLES wall time (4.5s -> 9.2s) — Catalyst re-analysis of the
        # nested join tree costs more than the extra checkpoint jobs
        ranks = ranks.localCheckpoint()
    return (
        ranks.join(nodes.select("node", "deg"), "node")
        .select(F.col("node").alias("doc_id"),
                F.round("rank", PR_ROUND).alias("rank"), "deg")
        .orderBy(F.desc("rank"), F.asc("doc_id"))
        .limit(20)
    )


def dd_dedup_graph_pagerank_sql(table: str = "documents") -> str:
    """Unrolled power iteration: PR_ITERS chained CTEs, each the exact
    per-round formula of dedup_graph_pagerank (base + damping *
    sum(rank/deg) per destination). The symmetric LSH edge set, degree
    table, and 1/n initialization mirror the Spark build; node set is
    closed under the symmetric edges so no round drops nodes."""
    lsh = dd_dedup_minhash_lsh_sql(table)
    base = f"({1.0 - PR_DAMPING!r} / nn.n)"
    rounds = []
    prev = "r0"
    for i in range(1, PR_ITERS + 1):
        rounds.append(f"""r{i} AS (
  SELECT e.dst AS node,
         {base} + {PR_DAMPING!r} * sum(r.rank / e.deg) AS rank
  FROM ed e JOIN {prev} r ON e.src = r.node CROSS JOIN nn
  GROUP BY e.dst, nn.n
)""")
        prev = f"r{i}"
    chain = ",\n".join(rounds)
    return f"""
WITH pairs AS (SELECT doc_a, doc_b FROM ({lsh})),
sym AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst FROM pairs
),
deg AS (SELECT src, count(*)::BIGINT AS deg FROM sym GROUP BY src),
nodes AS (SELECT src AS node, deg FROM deg),
nn AS (SELECT count(*) AS n FROM nodes),
ed AS (SELECT s.src, s.dst, d.deg FROM sym s JOIN deg d ON s.src = d.src),
r0 AS (SELECT node, 1.0 / nn.n AS rank FROM nodes CROSS JOIN nn),
{chain}
SELECT node AS doc_id, rank, deg FROM (
  SELECT r.node, round(r.rank, {PR_ROUND}) AS rank, n.deg
  FROM {prev} r JOIN nodes n ON r.node = n.node
)
ORDER BY rank DESC, doc_id ASC
LIMIT 20
""".strip()


def dedup_graph_triangles(docs: DataFrame) -> DataFrame:
    """Triangle census of the near-dup candidate graph: n_nodes, n_edges,
    n_triangles, n_wedges, and the global clustering coefficient
    (3T / wedges) — the density diagnostic that tells a dedup pipeline
    whether its candidate pairs form tight cliques (true dup groups) or
    sprawling chains (LSH band collisions worth re-tuning).

    Counting uses the id-ordered join (a<b<c over canonical pairs): two
    joins on the PAIR table, never the corpus. The pair set is LSH
    bucket-local, so the join input is orders of magnitude smaller than
    the corpus; for skew-heavy graphs swap id-ordering for degree
    orientation (same output, bounded wedge fan-out per node).

    The edge table feeds SIX subtrees (degree union x2, the three
    triangle sides, the edge count), so it is localCheckpoint'ed once —
    the same discipline as dedup_graph_pagerank — instead of re-running
    the LSH band join per consumer.
    """
    edges = dedup_minhash_lsh(docs).select("doc_a", "doc_b").localCheckpoint()
    # wedges at b: edges (a,b),(b,c) with a<b<c — plus wedges at the low
    # and high endpoints; total wedges = sum over nodes of C(deg,2)
    deg = (
        edges.select(F.col("doc_a").alias("node"))
        .unionByName(edges.select(F.col("doc_b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    wedges = deg.agg(
        F.sum(F.col("deg") * (F.col("deg") - 1) / 2).cast("long")
        .alias("n_wedges"),
        F.count(F.lit(1)).alias("n_nodes"),
    )
    e1 = edges.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    e2 = edges.select(F.col("doc_a").alias("b"), F.col("doc_b").alias("c"))
    e3 = edges.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("c"))
    tri = (
        e1.join(e2, "b")
        .join(e3, ["a", "c"], "left_semi")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    n_edges = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        wedges.crossJoin(F.broadcast(n_edges))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_nodes", "n_edges", "n_triangles", "n_wedges",
            F.round(
                F.when(F.col("n_wedges") > 0,
                       3.0 * F.col("n_triangles") / F.col("n_wedges"))
                .otherwise(F.lit(0.0)),
                6,
            ).alias("clustering_coeff"),
        )
    )


def dd_dedup_graph_triangles_sql(table: str = "documents") -> str:
    return f"""
WITH pairs AS (
  {dd_dedup_minhash_lsh_sql(table)}
),
edges AS (SELECT doc_a, doc_b FROM pairs),
deg AS (
  SELECT node, count(*)::BIGINT AS deg FROM (
    SELECT doc_a AS node FROM edges
    UNION ALL
    SELECT doc_b AS node FROM edges
  ) GROUP BY node
),
wedges AS (
  SELECT (sum(deg * (deg - 1) / 2))::BIGINT AS n_wedges,
         count(*)::BIGINT AS n_nodes
  FROM deg
),
tri AS (
  SELECT count(*)::BIGINT AS n_triangles
  FROM edges e1
  JOIN edges e2 ON e1.doc_b = e2.doc_a
  WHERE EXISTS (
    SELECT 1 FROM edges e3
    WHERE e3.doc_a = e1.doc_a AND e3.doc_b = e2.doc_b
  )
),
ne AS (SELECT count(*)::BIGINT AS n_edges FROM edges)
SELECT w.n_nodes, ne.n_edges, t.n_triangles, w.n_wedges,
       round(CASE WHEN w.n_wedges > 0
                  THEN 3.0 * t.n_triangles / w.n_wedges
                  ELSE 0.0 END, 6) AS clustering_coeff
FROM wedges w CROSS JOIN ne CROSS JOIN tri t
""".strip()


DEDUP_THRESHOLD_SWEEP = (0.5, 0.625, 0.75, 0.875, 1.0)


def dedup_threshold_curve(docs: DataFrame) -> DataFrame:
    """Dedup aggressiveness curve: candidate pairs, docs flagged, and
    flagged fraction at each est-Jaccard cutoff in the sweep — the
    tuning table a pipeline reads before picking its near-dup threshold
    (too low deletes paraphrases, too high keeps templated spam).

    ONE LSH pass and ONE aggregation: the banded pair set is computed
    once at the loosest threshold, each sweep value fans out by an
    explode, and pairs + distinct flagged docs aggregate together per
    threshold. Cutoffs with zero qualifying pairs still get a row
    (n_pairs = 0) via the left join from the sweep list — a tuning table
    with silently missing rows would misread as "cutoff not evaluated".
    """
    pairs = dedup_minhash_lsh(docs).select("doc_a", "doc_b", "est_jaccard")
    n_docs = docs.select(
        F.countDistinct("doc_id").cast("double").alias("n_docs")
    )
    sweep = n_docs.select(
        F.explode(
            F.array(*[F.lit(t) for t in DEDUP_THRESHOLD_SWEEP])
        ).alias("threshold"),
        "n_docs",
    )
    fanned = pairs.select(
        "*",
        F.explode(
            F.array(*[F.lit(t) for t in DEDUP_THRESHOLD_SWEEP])
        ).alias("threshold"),
    ).where(F.col("est_jaccard") >= F.col("threshold"))
    stats = fanned.groupBy("threshold").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.countDistinct("doc_b").alias("n_flagged"),
    )
    return (
        sweep.join(stats, "threshold", "left")
        .select(
            "threshold",
            F.coalesce(F.col("n_pairs"), F.lit(0)).alias("n_pairs"),
            F.coalesce(F.col("n_flagged"), F.lit(0)).alias("n_flagged"),
            F.round(
                F.coalesce(F.col("n_flagged"), F.lit(0)) / F.col("n_docs"), 6
            ).alias("flagged_frac"),
        )
        .orderBy("threshold")
    )


def dd_dedup_threshold_curve_sql(table: str = "documents") -> str:
    # ::DOUBLE — a bare VALUES (0.5) is DECIMAL(4,3) in DuckDB, which the
    # driver harness renders as '0.500' and hash-mismatches Spark's 0.5
    sweep_vals = ", ".join(f"({t}::DOUBLE)" for t in DEDUP_THRESHOLD_SWEEP)
    return f"""
WITH pairs AS (
  {dd_dedup_minhash_lsh_sql(table)}
),
nd AS (SELECT count(DISTINCT doc_id)::DOUBLE AS n_docs FROM {table}),
sweep AS (SELECT threshold FROM (VALUES {sweep_vals}) s(threshold)),
fanned AS (
  SELECT p.doc_a, p.doc_b, p.est_jaccard, s.threshold
  FROM pairs p CROSS JOIN sweep s
  WHERE p.est_jaccard >= s.threshold
),
stats AS (
  SELECT threshold, count(*)::BIGINT AS n_pairs,
         count(DISTINCT doc_b)::BIGINT AS n_flagged
  FROM fanned GROUP BY threshold
)
SELECT s.threshold, coalesce(st.n_pairs, 0)::BIGINT AS n_pairs,
       coalesce(st.n_flagged, 0)::BIGINT AS n_flagged,
       round(coalesce(st.n_flagged, 0) / nd.n_docs, 6) AS flagged_frac
FROM sweep s LEFT JOIN stats st USING (threshold) CROSS JOIN nd
ORDER BY s.threshold
""".strip()


# --- incremental (batch-vs-existing) dedup ------------------------------------

BATCH_MOD = 5  # deterministic ingestion split: doc_id % 5 == 0 is the batch


def dedup_incremental_batch(docs: DataFrame) -> DataFrame:
    """Ingestion-time dedup: decide each NEW batch document against the
    already-kept corpus — the shape a real pipeline runs on every
    arriving shard, where re-deduplicating 100 TB from scratch is not an
    option. Deterministic split for the oracle: doc_id % BATCH_MOD == 0
    is the batch, the rest is the existing corpus.

    Tiers (exact wins over near):
    - exact_dup: the batch doc's md5 fingerprint exists in the corpus,
      or a lower-id batch doc shares it (within-batch keep-min rule) —
      one hash semi-join.
    - near_dup: >=1 existing partner shares an LSH band bucket AND the
      minhash-estimated Jaccard clears JACCARD_THRESHOLD — the banded
      join is batch x existing only (bucket-local, never corpus x
      corpus).
    - kept: everything else.

    This self-contained form computes BOTH sides' signatures in-plan —
    the reference semantics and the oracle's shape. The production form
    at 100 TB is :func:`dedup_incremental_probe` over the written
    append-only signature store (``index/dedup_layout``), which spends
    compute on the arriving batch only; both share
    :func:`_incremental_decide` and are value-identical.

    Output: (doc_id, decision, n_near) per batch document, n_near =
    count of confirmed existing near-dup partners.
    """
    is_batch = F.col("doc_id") % BATCH_MOD == 0
    bfp = docs.where(is_batch).select(
        "doc_id", F.md5(F.col("text")).alias("fp")
    )
    efp = docs.where(~is_batch).select(
        F.md5(F.col("text")).alias("fp")
    ).distinct()
    sig = minhash_signatures(docs).cache()
    bands = _band_sigs(sig)
    return _incremental_decide(
        bfp, efp,
        bands.where(F.col("doc_id") % BATCH_MOD == 0),
        bands.where(F.col("doc_id") % BATCH_MOD != 0),
        sig.where(F.col("doc_id") % BATCH_MOD == 0),
        sig.where(F.col("doc_id") % BATCH_MOD != 0),
    )


def dedup_incremental_probe(spark, docs: DataFrame,
                            layout_dir: str) -> DataFrame:
    """Same semantics and output as :func:`dedup_incremental_batch`, but
    the EXISTING side comes from the written signature store
    (``index/dedup_layout``) instead of being recomputed from text —
    the shape every arriving shard actually runs at 100 TB. Compute is
    batch-proportional: shingles/minhash run over the batch only; the
    existing side is a column-pruned scan of written hash tables (the
    r7 bench's one real regression was exactly the recompute this
    removes). Signatures are per-doc deterministic, so the result is
    value-identical to the self-contained form and shares its oracle.
    """
    return decide_batch_against_store(
        spark, docs.where(F.col("doc_id") % BATCH_MOD == 0), layout_dir
    )


def decide_batch_against_store(spark, batch_docs: DataFrame,
                               layout_dir: str,
                               caches: list | None = None) -> DataFrame:
    """Decide ONE arriving shard (any (doc_id, text) frame) against the
    written signature store — the unit the streaming ingestion loop
    runs per micro-batch (streaming/docs.run_streaming_incremental_
    dedup): decide the shard, append the kept docs' signatures to the
    store, repeat. Within-shard duplicates resolve by keep-min id;
    cross-shard duplicates are the store's job (the earlier shard's
    append made them visible).

    The batch-side signature/fingerprint frames are cached (each feeds
    multiple tiers). Callers that run this repeatedly — one decide per
    micro-batch in a long-lived ingestion stream — pass a ``caches``
    list and unpersist its entries once the slice's result is
    materialized; otherwise the per-batch cache entries accumulate in
    executor storage for the stream's lifetime (r8 advisor finding)."""
    from ..index.dedup_layout import read_bands, read_fp, read_sigs

    bfp = batch_docs.select(
        "doc_id", F.md5(F.col("text")).alias("fp")
    )
    bsig = minhash_signatures(batch_docs)
    if caches is not None:
        # bfp feeds three tiers, bsig two; cache them with an EXPLICIT
        # lifetime for callers that unpersist (the streaming loop) — a
        # tracked-nowhere cache per probe call would accumulate across
        # a long session (r9 review + advisor findings)
        bfp = bfp.cache()
        bsig = bsig.cache()
        caches.extend([bfp, bsig])
    else:
        # one-shot callers still need the reuse (recomputing bsig's
        # shingle+minhash pass per consumer cost ~0.7s/probe at sf0.1),
        # but without a tracked lifetime: localCheckpoint blocks are
        # released by the ContextCleaner once the plan is GC'd — the
        # same untracked-pin pattern as bigram_pmi's count tables
        bfp = bfp.localCheckpoint(eager=False)
        bsig = bsig.localCheckpoint(eager=False)
    efp = read_fp(spark, layout_dir).select("fp").distinct()
    return _incremental_decide(
        bfp, efp,
        _band_sigs(bsig), read_bands(spark, layout_dir),
        bsig, read_sigs(spark, layout_dir),
    )


def _incremental_decide(bfp: DataFrame, efp: DataFrame,
                        bands_batch: DataFrame, bands_ext: DataFrame,
                        sig_batch: DataFrame,
                        sig_ext: DataFrame) -> DataFrame:
    """Decision core shared by the self-contained and layout-probe forms:
    exact tier (fingerprint semi-join + within-batch keep-min), candidate
    tier (batch x existing banded LSH join — bucket-local, never corpus x
    corpus), verify tier (minhash-estimated Jaccard >= threshold).

    Plan shape: the BATCH side is small by definition (one arriving
    shard vs the kept corpus), so every join against an existing-side
    table broadcasts batch-derived keys — the big tables (corpus
    fingerprints, band keys, signatures) are only ever SCANNED and
    map-side filtered, never shuffled. Without the hints the 100x
    INCDEDUP probe shuffled the full bands (3.2M rows) and sigs (6.4M
    rows) tables and read as slow as recomputing them (r8 profiling);
    with them the per-shard work is batch-proportional for real.
    """
    from pyspark.sql import Window

    # corpus fingerprints: map-side semi-filter by the batch's fps, THEN
    # the (now tiny) surviving set broadcasts into the left join. The
    # broadcast build side is NOT pre-distinct'd: a hash-join build
    # handles duplicate keys, and the distinct was a whole extra shuffle
    # per decide (r9 fixed-overhead trim; latency matters because this
    # runs once per arriving micro-batch). The exact tier is a COLUMN on
    # the batch frame, not a separate frame re-joined at the end — the
    # r8 form built an `exact` id set and left-joined it back, which
    # cost a groupBy+join for the within-batch keep-min (now one fp
    # window over the 1-shard frame) plus a distinct and a final join.
    efp_hit = efp.join(F.broadcast(bfp.select("fp")), "fp", "leftsemi")
    flagged = (
        bfp.join(F.broadcast(efp_hit.withColumn("in_ext", F.lit(True))),
                 "fp", "left")
        .withColumn("keep_id",
                    F.min("doc_id").over(Window.partitionBy("fp")))
        .withColumn(
            "is_exact",
            F.col("in_ext").isNotNull()
            | (F.col("fp").isNotNull()
               & (F.col("doc_id") > F.col("keep_id"))),
        )
        # fp IS NULL (null text) never fingerprint-matches anything: the
        # r8 inner join dropped null fps implicitly; the window form
        # groups NULLs into one partition, so without the guard two
        # null-text docs would read as exact dups of each other (r9
        # review finding)
    )
    cand = (
        bands_ext.alias("b")
        .join(
            F.broadcast(bands_batch.alias("a")),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    # verify tier reads only the candidate partners' signatures: the
    # corpus sig table is map-side semi-filtered by the (LSH-bounded)
    # candidate ids before any shuffle (no distinct on the broadcast
    # build — see efp_hit)
    sig_ext_hit = sig_ext.join(
        F.broadcast(cand.select(F.col("doc_b").alias("doc_id"))),
        "doc_id", "leftsemi",
    )
    est = (
        cand.join(sig_batch.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(
            sig_ext_hit.alias("sb"),
            (F.col("doc_b") == F.col("sb.doc_id"))
            & (F.col("sa.seed") == F.col("sb.seed")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(
            F.round(
                F.avg(
                    F.when(F.col("sa.mh") == F.col("sb.mh"), 1.0).otherwise(0.0)
                ),
                SCORE_ROUND,
            ).alias("est_jaccard")
        )
    )
    near = (
        est.where(F.col("est_jaccard") >= F.lit(JACCARD_THRESHOLD))
        .groupBy("doc_a")
        .agg(F.count(F.lit(1)).alias("n_near"))
    )
    return (
        flagged.select("doc_id", "is_exact")
        .join(near.withColumnRenamed("doc_a", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.when(F.col("is_exact"), F.lit("exact_dup"))
            .when(F.col("n_near").isNotNull(), F.lit("near_dup"))
            .otherwise(F.lit("kept"))
            .alias("decision"),
            F.coalesce(F.col("n_near"), F.lit(0)).cast("long").alias("n_near"),
        )
    )


def dd_dedup_incremental_batch_sql(table: str = "documents") -> str:
    return f"""
WITH {dd_doc_shingles_cte(table)},
{dd_minhash_sig_cte()},
bands AS (
  SELECT doc_id, (seed // {MINHASH_ROWS})::INT AS band,
         md5(string_agg(mh::VARCHAR, ',' ORDER BY seed)) AS bsig
  FROM sig GROUP BY doc_id, band
),
batchdocs AS (
  SELECT doc_id, md5(text) AS fp FROM {table} WHERE doc_id % {BATCH_MOD} = 0
),
extfp AS (
  SELECT DISTINCT md5(text) AS fp FROM {table} WHERE doc_id % {BATCH_MOD} <> 0
),
bmin AS (SELECT fp, min(doc_id) AS keep_id FROM batchdocs GROUP BY fp),
exact AS (
  SELECT DISTINCT b.doc_id
  FROM batchdocs b
  LEFT JOIN extfp e ON b.fp = e.fp
  JOIN bmin m ON b.fp = m.fp
  WHERE e.fp IS NOT NULL OR b.doc_id > m.keep_id
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.bsig = b.bsig
  WHERE a.doc_id % {BATCH_MOD} = 0 AND b.doc_id % {BATCH_MOD} <> 0
),
est AS (
  SELECT c.doc_a, c.doc_b,
         round(avg(CASE WHEN sa.mh = sb.mh THEN 1.0 ELSE 0.0 END), {SCORE_ROUND}) AS est_jaccard
  FROM cand c
  JOIN sig sa ON sa.doc_id = c.doc_a
  JOIN sig sb ON sb.doc_id = c.doc_b AND sa.seed = sb.seed
  GROUP BY c.doc_a, c.doc_b
),
near AS (
  SELECT doc_a, count(*)::BIGINT AS n_near
  FROM est WHERE est_jaccard >= {JACCARD_THRESHOLD} GROUP BY doc_a
)
SELECT b.doc_id,
       CASE WHEN x.doc_id IS NOT NULL THEN 'exact_dup'
            WHEN n.n_near IS NOT NULL THEN 'near_dup'
            ELSE 'kept' END AS decision,
       coalesce(n.n_near, 0)::BIGINT AS n_near
FROM batchdocs b
LEFT JOIN exact x ON b.doc_id = x.doc_id
LEFT JOIN near n ON b.doc_id = n.doc_a
""".strip()


# --- SemDeDup: cluster-bucketed semantic dedup -------------------------------


def semdedup_mod(n: int) -> int:
    """Deterministic centroid stride for SemDeDup: every isqrt(N)-th
    vec_id, i.e. k ~ sqrt(N) centroids.

    This is the BALANCED scaling SemDeDup needs and the fixed-K /
    fixed-mod variants both lack: with k clusters over N vectors,
    assignment costs O(N*k) and the within-cell pair pass costs
    O(N^2/k) — k ~ sqrt(N) makes BOTH O(N^1.5). A fixed mod (r6,
    k = N/50) made assignment quadratic; a fixed K (first r7 attempt)
    made the pair pass quadratic — SCALING.md's EMB10X section measured
    that directly (261s at 10x the vectors, slope 1.57) before this
    rule replaced it. k is derived from the corpus COUNT, a one-scalar
    bounded action on the Spark side and the identical scalar subquery
    in the oracle, so both engines pick the same centroid set. At
    100 TB, sqrt(N) centroids are a few hundred MB — SemDeDup's real
    clustering cost, paid as a broadcast (the paper's k for LAION-440M
    is 50k clusters ~ 3.3*sqrt(N), same order)."""
    import math

    return max(1, math.isqrt(n))


def semdedup(emb: DataFrame,
             threshold: float = COSINE_DUP_THRESHOLD) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
    cluster the embeddings, then look for near-duplicate pairs ONLY within
    a cluster — the published training-data-pipeline shape that turns the
    inherent N^2 pair space into k independent (N/k)^2 cells. At 100 TB,
    k ~ sqrt(N) clusters bound each cell's pairwise pass, and the
    within-cell compute drops to a per-cell GEMM
    (dedup_embedding_cosine's block pattern applied per cell).

    Clustering here is the repo's deterministic k-means stand-in:
    every semdedup_mod(N)-th vec_id is a centroid, i.e. k ~ sqrt(N)
    clusters — the stride is derived from the corpus count (one bounded
    scalar action; the oracle computes the identical scalar subquery),
    and assignment is nearest-by-cosine with the SAME rounding and tie
    rule as operators/knn.assign_to_centroids, so the oracle stays
    exact. k ~ sqrt(N) is the balanced scaling (see semdedup_mod): both
    the assignment join and the within-cell pair pass are O(N^1.5); a
    real k-means fit (embeddings_kmeans_train) slots into the same seam
    without changing the plan. Keep rule, per the paper: within a
    duplicate pair, keep the vector LESS similar to its centroid
    (preserves cluster diversity); ties break to the lower vec_id. A
    vector is dropped when ANY cluster-mate beats it at
    cos_sim >= threshold — the one-shot form of the paper's greedy pass.

    Output: one row per cluster — cell, n_vecs, n_dropped, drop_ratio.
    """
    mod = semdedup_mod(emb.count())
    cent = emb.where(F.col("vec_id") % mod == 0).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("cvec")
    )
    return _semdedup_with_centroids(emb, cent, threshold)


def _semdedup_with_centroids(emb: DataFrame, cent: DataFrame,
                             threshold: float) -> DataFrame:
    """SemDeDup's cell-bounded plan with a PLUGGABLE centroid table
    (cent_id, cvec) — the seam a real k-means fit slots into without
    changing the plan shape. ``semdedup`` passes the deterministic
    sqrt(N) id-stride; ``semdedup_kmeans_cells`` passes Lloyd-trained
    centroids.

    r14 shape: assignment is the shared Arrow-GEMM pass
    (knn.assign_to_centroids with csim + vector passthrough — the one
    source of the assignment rule), and the whole within-cell stage —
    pair similarities, the keep-the-diverse rule, the per-cell counts —
    is ONE applyInPandas over groupBy(cell) emitting the final per-cell
    row. The old plan paid a crossJoin+row_number window (N x k rows
    exchanged and sorted), a localCheckpoint, a within-cell pair join
    with interpreted HOF cosine per pair, a distinct and a re-join +
    groupBy: five exchanges and the checkpoint. Now ONE exchange (the
    cell shuffle) after a map-only GEMM; within a cell the pair pass is
    a blocked GEMM (row-blocks bound the sim matrix at production cell
    sizes ~sqrt(N)). Same rounding (SCORE_ROUND before compare), same
    keep rule, verified value-identical to the old plan at
    sf0.001/0.01/0.1 and against the unchanged DuckDB oracle."""
    import numpy as np
    import pandas as pd

    from .knn import assign_to_centroids

    assign = assign_to_centroids(
        emb.select(F.col("vec_id").alias("c_id"),
                   F.col("embedding").alias("c_vec")),
        cent, with_sim=True, keep_vec=True,
    )

    def cell_stats(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["c_id"].to_numpy()
        csim = pdf["csim"].to_numpy()
        X = np.stack(pdf["c_vec"].to_numpy()).astype("float64")
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        n = len(ids)
        dropped = np.zeros(n, dtype=bool)
        bs = 2048  # bounds the sim block at bs x cell_size doubles
        for s in range(0, n, bs):
            e = min(s + bs, n)
            sims = np.round(Xn[s:e] @ Xn.T, SCORE_ROUND)
            near = sims >= threshold
            near[np.arange(e - s), np.arange(s, e)] = False  # self
            beats = (csim[None, :] < csim[s:e, None]) | (
                (csim[None, :] == csim[s:e, None])
                & (ids[None, :] < ids[s:e, None])
            )
            dropped[s:e] = (near & beats).any(axis=1)
        return pd.DataFrame({
            "cell": [int(pdf["cell"].iloc[0])],
            "n_vecs": [n],
            "n_dropped": [int(dropped.sum())],
        })

    stats = assign.groupBy("cell").applyInPandas(
        cell_stats, "cell long, n_vecs long, n_dropped long"
    )
    return stats.select(
        "cell",
        "n_vecs",
        "n_dropped",
        F.round(F.col("n_dropped") / F.col("n_vecs"), 6)
        .alias("drop_ratio"),
    ).orderBy("cell")


def semdedup_kmeans_cells(emb: DataFrame,
                          threshold: float = COSINE_DUP_THRESHOLD,
                          ) -> DataFrame:
    """Trained-centroid SemDeDup diagnostic (rows-only; VERDICT r7 #6):
    run the UNCHANGED cell-bounded plan twice — once with the
    deterministic sqrt(N) id-stride centroids (the oracled
    dedup_semantic_cells form) and once with Lloyd-trained centroids at
    the SAME k (operators/knn.kmeans_centroids) — and report corpus-level
    drop statistics side by side. This records the claim the seam's
    docstrings make: the centroid source is a build-time quality knob;
    the assignment/pair plan (and its O(N^1.5) envelope at k ~ sqrt(N))
    does not change.

    Rows-only for the same reason as embeddings_kmeans_train: the Lloyd
    float loop's assignment boundaries are not cross-engine stable.
    Output: one row per variant — variant, n_cells, n_vecs, n_dropped,
    drop_ratio — plus a 'delta' row (kmeans minus stride drop_ratio).
    """
    from .knn import kmeans_centroids

    # the stride's ACTUAL centroid count — counted from the same
    # predicate, not approximated as n // mod: vec_ids need not be
    # contiguous (post-dedup corpora), and even for 0..n-1 ids the
    # stride picks ceil(n / mod) centroids while n // mod floors, so
    # the "same k" claim would be off by one (or unboundedly, with
    # sparse ids) and the delta row would partly measure centroid
    # COUNT instead of centroid quality
    mod = semdedup_mod(emb.count())
    k = max(1, emb.where(F.col("vec_id") % mod == 0).count())
    stride_cells = semdedup(emb, threshold)
    trained = kmeans_centroids(emb, k=k)
    kmeans_cells = _semdedup_with_centroids(emb, trained, threshold)

    def summarize(cells: DataFrame, name: str) -> DataFrame:
        return cells.agg(
            F.lit(name).alias("variant"),
            F.count(F.lit(1)).alias("n_cells"),
            F.sum("n_vecs").alias("n_vecs"),
            F.sum("n_dropped").alias("n_dropped"),
            F.round(F.sum("n_dropped") / F.sum("n_vecs"), 6)
            .alias("drop_ratio"),
        )

    s = summarize(stride_cells, "stride").alias("s")
    t = summarize(kmeans_cells, "kmeans").alias("t")
    delta = s.crossJoin(t).select(
        F.lit("delta").alias("variant"),
        (F.col("t.n_cells") - F.col("s.n_cells")).alias("n_cells"),
        (F.col("t.n_vecs") - F.col("s.n_vecs")).alias("n_vecs"),
        (F.col("t.n_dropped") - F.col("s.n_dropped")).alias("n_dropped"),
        F.round(F.col("t.drop_ratio") - F.col("s.drop_ratio"), 6)
        .alias("drop_ratio"),
    )
    return s.unionByName(t).unionByName(delta).orderBy("variant")


def dd_semdedup_sql(table: str = "embeddings",
                    threshold: float = COSINE_DUP_THRESHOLD) -> str:
    cs_ec = dd_cosine_similarity("e.embedding", "c.cvec")
    cs_ab = dd_cosine_similarity("a.embedding", "b.embedding")
    return f"""
WITH cnt AS (
  SELECT count(*)::BIGINT AS n FROM {table}
),
stride AS (
  -- twin of semdedup_mod: k ~ sqrt(N) centroids, same scalar both
  -- engines. EXACT integer sqrt, not floor(sqrt()): the double guess is
  -- corrected over +-2 by integer comparison (g*g <= n), so counts
  -- where float sqrt rounds across an integer boundary (n just below a
  -- perfect square, n > ~2^52 — the 100TB regime) still match Python's
  -- math.isqrt on the Spark side instead of picking a different
  -- centroid set.
  SELECT greatest(1, max(g)) AS mod FROM (
    SELECT n, unnest(generate_series(
             greatest(CAST(floor(sqrt(n)) AS BIGINT) - 2, 0),
             CAST(floor(sqrt(n)) AS BIGINT) + 2)) AS g
    FROM cnt
  ) WHERE g * g <= n
),
cent AS (
  SELECT vec_id AS cent_id, embedding AS cvec
  FROM {table} WHERE vec_id % (SELECT mod FROM stride) = 0
),
sims AS (
  SELECT e.vec_id, e.embedding, c.cent_id,
         round({cs_ec}, {SCORE_ROUND}) AS csim
  FROM {table} e CROSS JOIN cent c
),
assigned AS (
  SELECT vec_id, embedding, cent_id AS cell, csim FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vec_id ORDER BY csim DESC, cent_id ASC) AS rn
    FROM sims
  ) WHERE rn = 1
),
dropped AS (
  SELECT DISTINCT a.vec_id
  FROM assigned a JOIN assigned b
    ON a.cell = b.cell AND a.vec_id <> b.vec_id
  WHERE round({cs_ab}, {SCORE_ROUND}) >= {threshold}
    AND (b.csim < a.csim OR (b.csim = a.csim AND b.vec_id < a.vec_id))
)
SELECT a.cell, count(*)::BIGINT AS n_vecs,
       count(d.vec_id)::BIGINT AS n_dropped,
       round(count(d.vec_id) * 1.0 / count(*), 6) AS drop_ratio
FROM assigned a LEFT JOIN dropped d ON a.vec_id = d.vec_id
GROUP BY a.cell
ORDER BY a.cell
""".strip()


# --- exact substring-span dedup (hashed n-gram form) -------------------------


SPAN_N = 8  # duplicated-span n-gram length, in tokens


def dedup_duplicate_spans(docs: DataFrame, n: int = SPAN_N) -> DataFrame:
    """Duplicated-substring detection (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better", arXiv:2107.06499): find
    every token position whose length-``n`` n-gram occurs MORE THAN ONCE
    anywhere in the corpus (other docs or elsewhere in the same doc),
    then merge overlapping/adjacent duplicated positions into maximal
    spans per document — the per-doc "how much of this text is copied"
    signal that drives span-level trimming in training pipelines.

    This is the hashed fixed-N form of the paper's suffix-array method
    (the shape RefinedWeb/Dolma-style pipelines run): an inverted index
    on the n-gram hash — one shuffle to count occurrences, one semi-join
    back to positions, per-doc windows for the gaps-and-islands span
    merge. Never all-pairs, never a global sort of the corpus; the
    n-gram hash (60-bit md5, functions/hashing.py) keeps the shuffle key
    8 bytes at 100 TB.

    Output per doc: doc_id, n_tokens, n_spans, dup_tokens, dup_fraction.
    """
    from pyspark.sql import Window

    toks = docs.select("doc_id", tokenize(F.col("text")).alias("t"))
    base = toks.select("doc_id", F.size("t").cast("long").alias("n_tokens"))
    # the gram+md5 subtree is the expensive half of this plan: build it
    # ONCE from a doc_id-spread scan (single-file test inputs are one
    # task otherwise; at scale the repartition shuffles text once, far
    # fewer bytes than the exploded grams) and find duplicated hashes
    # with a count window over h instead of groupBy+self-join — the
    # join form re-executed the whole gram subtree for its probe side
    # (2 gram passes + 2 shuffles -> 1 pass + 1 shuffle, r14).
    spark = docs.sparkSession
    toks_p = docs.repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    ).select("doc_id", tokenize(F.col("text")).alias("t"))
    gs = F.when(
        F.size("t") >= n,
        F.transform(
            F.sequence(F.lit(1), F.size("t") - (n - 1)),
            lambda i: F.array_join(F.slice("t", i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    hg = (
        toks_p.select("doc_id", F.posexplode(gs).alias("pos0", "g"))
        .select("doc_id", (F.col("pos0") + 1).alias("pos"),
                h64(F.col("g")).alias("h"))
    )
    wh = Window.partitionBy("h")
    dpos = (
        hg.withColumn("c", F.count(F.lit(1)).over(wh))
        .where(F.col("c") >= 2)
        .select("doc_id", "pos")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    with_prev = dpos.withColumn("prev", F.lag("pos").over(w))
    brk = F.when(
        F.col("prev").isNull() | (F.col("pos") - F.col("prev") > n), 1
    ).otherwise(0)
    isl = with_prev.withColumn("island", F.sum(brk).over(w))
    spans = isl.groupBy("doc_id", "island").agg(
        (F.max("pos") + n - F.min("pos")).alias("span_tokens")
    )
    perdoc = spans.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum("span_tokens").alias("dup_tokens"),
    )
    return (
        base.join(perdoc, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(F.col("n_spans"), F.lit(0)).cast("long")
            .alias("n_spans"),
            F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("long")
            .alias("dup_tokens"),
            F.when(F.col("n_tokens") == 0, F.lit(0.0))
            .otherwise(
                F.round(
                    F.coalesce(F.col("dup_tokens"), F.lit(0))
                    / F.col("n_tokens"),
                    6,
                )
            )
            .alias("dup_fraction"),
        )
        .orderBy("doc_id")
    )


def dd_dedup_duplicate_spans_sql(table: str = "documents",
                                 n: int = SPAN_N) -> str:
    toks = dd_tokenize("text")
    return f"""
WITH toks AS (
  SELECT doc_id, {toks} AS t FROM {table}
),
base AS (SELECT doc_id, len(t)::BIGINT AS n_tokens FROM toks),
grams AS (
  SELECT doc_id, generate_subscripts(gs, 1) AS pos, unnest(gs) AS g
  FROM (
    SELECT doc_id,
           CASE WHEN len(t) >= {n} THEN
             list_transform(range(1, len(t) - {n} + 2),
                            i -> array_to_string(list_slice(t, i, i + {n} - 1), ' '))
           ELSE [] END AS gs
    FROM toks
  )
),
hg AS (SELECT doc_id, pos, {dd_h64('g')} AS h FROM grams),
duph AS (SELECT h FROM hg GROUP BY h HAVING count(*) >= 2),
dpos AS (SELECT doc_id, pos FROM hg WHERE h IN (SELECT h FROM duph)),
isl AS (
  SELECT doc_id, pos,
         sum(CASE WHEN prev IS NULL OR pos - prev > {n} THEN 1 ELSE 0 END)
           OVER (PARTITION BY doc_id ORDER BY pos) AS island
  FROM (
    SELECT doc_id, pos,
           lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
    FROM dpos
  )
),
spans AS (
  SELECT doc_id, island, max(pos) + {n} - min(pos) AS span_tokens
  FROM isl GROUP BY doc_id, island
),
perdoc AS (
  SELECT doc_id, count(*)::BIGINT AS n_spans,
         sum(span_tokens)::BIGINT AS dup_tokens
  FROM spans GROUP BY doc_id
)
SELECT b.doc_id, b.n_tokens,
       coalesce(p.n_spans, 0)::BIGINT AS n_spans,
       coalesce(p.dup_tokens, 0)::BIGINT AS dup_tokens,
       CASE WHEN b.n_tokens = 0 THEN 0.0
            ELSE round(coalesce(p.dup_tokens, 0) * 1.0 / b.n_tokens, 6)
       END AS dup_fraction
FROM base b LEFT JOIN perdoc p ON b.doc_id = p.doc_id
ORDER BY b.doc_id
""".strip()


def dedup_trim_spans(docs: DataFrame, n: int = SPAN_N) -> DataFrame:
    """The ACTIONABLE half of duplicate-span detection: emit the corpus
    with every duplicated span removed (Lee et al. 2022 drop the repeated
    substring occurrences before training). A token survives unless some
    duplicated n-gram's window [p, p+n-1] covers it; kept tokens rejoin
    in position order.

    Scale shape: the duplicated-position set rides the same inverted
    8-gram index as dedup_duplicate_spans; coverage expands each dup
    position into its n covered slots map-side (bounded x n blowup on
    the DUP positions only, not the corpus), one anti-join keyed
    (doc_id, pos) drops them, and the rebuild is a per-doc aggregate —
    sorted-struct collect, the same codegen idiom the minhash band
    signature uses. No windows, no per-row Python.

    Output per doc: doc_id, n_tokens, n_removed, kept_text.
    """
    from pyspark.sql import Window

    toks = docs.select("doc_id", tokenize(F.col("text")).alias("t"))
    # doc_id-spread twin of the scan for the per-position branches (the
    # single-file test inputs are one task otherwise; the exchange is
    # reused by the downstream doc_id-keyed joins/aggregates)
    spark = docs.sparkSession
    toks_p = docs.repartition(
        spark.sparkContext.defaultParallelism, "doc_id"
    ).select("doc_id", tokenize(F.col("text")).alias("t"))
    pos_tok = toks_p.select(
        "doc_id", F.posexplode("t").alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    gs = F.when(
        F.size("t") >= n,
        F.transform(
            F.sequence(F.lit(1), F.size("t") - (n - 1)),
            lambda i: F.array_join(F.slice("t", i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # ONE gram+md5 pass with a count window over h (the groupBy+join
    # form re-executed the gram subtree for the probe side — 2 passes
    # + 2 shuffles -> 1 + 1, r14; same rewrite as dedup_duplicate_spans)
    hg = (
        toks_p.select("doc_id", F.posexplode(gs).alias("pos0", "g"))
        .select("doc_id", (F.col("pos0") + 1).alias("pos"),
                h64(F.col("g")).alias("h"))
    )
    wh = Window.partitionBy("h")
    covered = (
        hg.withColumn("c", F.count(F.lit(1)).over(wh))
        .where(F.col("c") >= 2)
        .select("doc_id",
                F.explode(F.sequence(F.col("pos"),
                                     F.col("pos") + (n - 1))).alias("pos"))
        .distinct()
    )
    kept = pos_tok.join(covered, ["doc_id", "pos"], "left_anti")
    rebuilt = kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                lambda x: x["tok"],
            ),
            " ",
        ).alias("kept_text"),
    )
    return (
        toks.select("doc_id", F.size("t").cast("long").alias("n_tokens"))
        .join(rebuilt, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            (F.col("n_tokens")
             - F.coalesce(F.col("n_kept"), F.lit(0))).cast("long")
            .alias("n_removed"),
            F.coalesce(F.col("kept_text"), F.lit("")).alias("kept_text"),
        )
        .orderBy("doc_id")
    )


def dd_dedup_trim_spans_sql(table: str = "documents",
                            n: int = SPAN_N) -> str:
    toks = dd_tokenize("text")
    return f"""
WITH toks AS (
  SELECT doc_id, {toks} AS t FROM {table}
),
pos_tok AS (
  SELECT doc_id, generate_subscripts(t, 1) AS pos, unnest(t) AS tok
  FROM toks
),
grams AS (
  SELECT doc_id, generate_subscripts(gs, 1) AS pos, unnest(gs) AS g
  FROM (
    SELECT doc_id,
           CASE WHEN len(t) >= {n} THEN
             list_transform(range(1, len(t) - {n} + 2),
                            i -> array_to_string(list_slice(t, i, i + {n} - 1), ' '))
           ELSE [] END AS gs
    FROM toks
  )
),
hg AS (SELECT doc_id, pos, {dd_h64('g')} AS h FROM grams),
duph AS (SELECT h FROM hg GROUP BY h HAVING count(*) >= 2),
covered AS (
  SELECT DISTINCT doc_id, pos + off AS pos
  FROM hg, unnest(range(0, {n})) u(off)
  WHERE h IN (SELECT h FROM duph)
),
kept AS (
  SELECT p.doc_id, p.pos, p.tok
  FROM pos_tok p LEFT JOIN covered c
    ON p.doc_id = c.doc_id AND p.pos = c.pos
  WHERE c.pos IS NULL
),
rebuilt AS (
  SELECT doc_id, count(*)::BIGINT AS n_kept,
         string_agg(tok, ' ' ORDER BY pos) AS kept_text
  FROM kept GROUP BY doc_id
)
SELECT t.doc_id, len(t.t)::BIGINT AS n_tokens,
       (len(t.t) - coalesce(r.n_kept, 0))::BIGINT AS n_removed,
       coalesce(r.kept_text, '') AS kept_text
FROM toks t LEFT JOIN rebuilt r ON t.doc_id = r.doc_id
ORDER BY t.doc_id
""".strip()
