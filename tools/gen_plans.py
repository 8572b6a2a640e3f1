"""Regenerate PLANS.md — formatted physical plans of headline queries.

Run from the repo root:  python tools/gen_plans.py  [sf_dir]

For each entry: the `.explain("formatted")` operator tree plus the scan
lines that carry the evidence (PushedFilters / PartitionFilters /
Location) — the artifacts SCALE.md's plan-shape claims point at.
"""

from __future__ import annotations

import os
import re
import sys

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)

# (query name, one-line description of the claimed plan shape)
ENTRIES = [
    ("bm25_topk",
     "BM25 probe over the written scored-postings layout: one pruned "
     "scan, no joins"),
    ("bm25_incremental_layout_probe",
     "BM25 over the SEGMENTED (append-maintained) FTS store: term-pruned "
     "postings + docfreq-delta scans, global stats summed in-plan, "
     "TakeOrdered top-k"),
    ("bm25_folded_layout_probe",
     "BM25 over a FOLDED segmented store: the fold-time postings_scored "
     "table restores the one-shot layout's join-free pruned scan"),
    ("hybrid_search_fused",
     "hybrid = pruned FTS branch + vector branch + broadcast candidate "
     "fetch"),
    ("hybrid_search_ivf_fused",
     "both branches written-layout-served: term-pruned postings_scored "
     "+ cell-partition-pruned IVF probe"),
    ("ann_ivf_topk",
     "IVF probe: partition-pruned scan of the persisted cell layout"),
    ("tpch_q9_product_profit",
     "star join: dimensions broadcast, only lineitem<->orders and "
     "lineitem<->partsupp shuffle"),
    ("dedup_minhash_lsh",
     "banded LSH self-join: pair space bucket-local, no all-pairs"),
    ("ann_filtered_topk",
     "filter applied BEFORE distance math"),
    ("lineitem_bloom_join_prune",
     "bloom bit table built distributed, broadcast into the probe"),
    ("lineitem_equi_depth_histogram",
     "distributed_ntile: range slices + partitioned rank windows, no "
     "global sort of the fact table"),
    ("customer_rfm_segments",
     "three distributed_ntile quartile passes, each a bounded range "
     "shuffle (first two behind checkpoint boundaries)"),
    ("embeddings_kmeans_step",
     "k-means assignment: K centroid literals inlined into a codegen'd "
     "distance expression — no join before the K-row aggregate"),
    ("events_rolling_active_users",
     "sliding COUNT DISTINCT via bounded ×7 explode of distinct "
     "user-days — no range self-join, no unpartitioned window"),
    ("search_snippets",
     "top-k hit set broadcast into the documents join; text read for "
     "k rows only"),
    ("text_bigram_pmi",
     "vocabulary-unbounded key joins (no broadcast of unigram counts); "
     "MIN_COUNT filter shrinks the bigram side before joining"),
    ("basket_part_pairs",
     "market-basket pairs: ONE groupBy(orderkey) into basket arrays "
     "(capped at 64 items), pairs generated map-side from each array "
     "(no self-join, no persist), support filter before the item-count "
     "joins, top-N via TakeOrderedAndProject"),
    ("orders_merge_upsert",
     "CDC MERGE: exactly one full-outer join on the key, derived batch "
     "stays distributed, single-row summary out"),
    ("text_tfidf_topk",
     "TF-IDF keywords: vocab-sized df join kept as a shuffle join "
     "(no broadcast of an unbounded vocabulary); per-doc "
     "WindowGroupLimit top-k"),
    ("orders_incremental_agg_merge",
     "incremental maintenance: two partial aggregates merged by a "
     "second aggregate — no rescan of merged history at scale"),
    ("corpus_benchmark_contamination",
     "decontamination dashboard: per-doc shingle dedup MAP-SIDE "
     "(array_distinct before explode), benchmark shingle set broadcast "
     "into a hash semi-probe — the corpus is never shuffled on shingle"),
    ("embeddings_matryoshka_recall",
     "truncated-retrieval recall: ONE corpus scan scores full + prefix "
     "cosine per pair (broadcast query side), two rank windows over the "
     "same shuffled pair set"),
    ("events_retention_triangle",
     "cohort retention: distinct (user, day) grid first (grid << raw "
     "events), per-user min window (partitioned), one aggregate, "
     "broadcast day-0 sizes"),
    ("hybrid_search_filtered",
     "metadata-filtered hybrid: lang semi-join lands BEFORE each "
     "branch's top-k; fusion + fetch identical to the unfiltered plan "
     "(one scaffold)"),
    ("corpus_ngram_novelty",
     "first-occurrence novelty: min-owner aggregate doubles as the "
     "novel-count table — two linear shuffles, doc-sized joins, no "
     "shingle-keyed big-big join"),
    ("ann_ivfpq_layout_probe",
     "IVF-PQ disk probe: PartitionFilters prune codes to NPROBE cells; "
     "codebook/LUT broadcast; raw vectors never read"),
    ("ann_sq8_layout_probe",
     "SQ8 disk probe: array<smallint> codes scan (1/4 the raw bytes), "
     "map-side dequant vs the broadcast O(dim) stats row, one top-k "
     "shuffle"),
    ("ann_pq_rescore_topk",
     "shortlist-then-rescore: ADC over the written codes layout keeps "
     "k*4 per query; only shortlist rows join raw vectors for the "
     "exact rerank"),
    ("dedup_duplicate_spans",
     "substring-span dedup: inverted index on the 8-gram hash (one "
     "bounded-key shuffle), semi-join back to positions, per-doc "
     "partitioned windows for the island merge — no all-pairs"),
    ("dedup_semantic_cells",
     "SemDeDup: centroid set broadcast, pair join keyed on the cell id "
     "so the pair space is k independent cells, never corpus x corpus"),
    ("corpus_dsir_weights",
     "DSIR: bucket-bounded model aggregate (1024 keys), log-ratio "
     "table broadcast into a map-side per-doc scoring join"),
    ("corpus_dsir_resample",
     "Gumbel-top-k = TakeOrderedAndProject over the weights pass — "
     "per-partition top-k, no global sort"),
    ("search_rank_agreement",
     "branch-agreement diagnostic: ONE batched postings scan scores all "
     "queries (broadcast query-term table), cosine side broadcasts the "
     "query vectors; agreement join touches 2*k*n_q rows"),
    ("ann_ivfpq_append_probe",
     "append-built codes layout probed like the one-shot build: "
     "PartitionFilters prune to NPROBE cells — incremental maintenance "
     "leaves the probe plan unchanged"),
    ("media_png_decode_stats",
     "binaryFile source packs small files per task; PNG decode is one "
     "Arrow mapInPandas crossing emitting scalar rows only"),
    ("text_gopher_repetition",
     "posexplode + per-doc lead() window builds all five Gopher n-gram "
     "sizes codegen-side; one shared (doc_id, n, gram) aggregate, "
     "windows partitioned per doc"),
    ("dedup_incremental_batch",
     "batch-vs-existing dedup probing the WRITTEN signature store: "
     "shingle/minhash compute over the arriving batch only; the "
     "existing side is a column-pruned parquet scan of fp/band/sig "
     "hash tables — per-shard cost batch-proportional (r8)"),
    ("dedup_incremental_layout_probe",
     "same probe plan against a store reached via base-build + append "
     "maintenance — appends leave the probe plan unchanged, same "
     "full-corpus oracle"),
    ("media_png_features",
     "decode -> 4x4-grid feature pooling end-to-end on real PNG bytes: "
     "one Arrow mapInPandas crossing, scalar (file, dim, value) rows "
     "out; oracle recomputes the means from pixel formulas"),
    ("media_wav_window_stats",
     "stdlib-wave PCM decode -> hop-128 windowed integer stats; "
     "binaryFile packs files per task, one Arrow crossing, scalar "
     "rows out"),
    ("corpus_filter_funnel",
     "every doc reduces to its first-failing-stage index in the flag "
     "pass, so the funnel is a <=11-row broadcast aggregate — no "
     "per-stage rescans at any corpus size"),
]


def formatted_plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from duckdb_hybrid_doc_search_spark.plans import registry
    from duckdb_hybrid_doc_search_spark.session import get_spark

    registry._load_all()
    spark = get_spark("gen-plans")

    out = [
        "# PLANS — formatted physical plans of headline queries "
        f"({os.path.basename(sf_dir.rstrip('/'))})",
        "",
        "Auto-generated by tools/gen_plans.py each round. Evidence for "
        "the plan-shape claims in SCALE.md: `PushedFilters`/"
        "`PartitionFilters` on scans, `BroadcastHashJoin` on bounded "
        "sides, no `BatchEvalPython` in relational pipelines, "
        "`TakeOrderedAndProject` top-k.",
    ]
    for name, blurb in ENTRIES:
        df = registry.REGISTRY[name].spark_fn(spark, sf_dir)
        full = formatted_plan(df)
        tree = full.split("\n\n")[0]
        evidence = []
        for block in re.split(r"\n(?=\(\d+\) )", full):
            if not re.match(r"\(\d+\) Scan", block):
                continue
            lines = [block.splitlines()[0]]
            for line in block.splitlines()[1:]:
                if re.match(
                    r"\s*(Location|PushedFilters|PartitionFilters)", line
                ):
                    lines.append(line.strip()[:160])
            evidence.append("\n".join("  " + ln if i else ln
                                      for i, ln in enumerate(lines)))
        out += ["", f"## {name}", "", blurb, "", "```", tree.strip()]
        if evidence:
            out += ["", "-- scan evidence --"] + evidence
        out += ["```"]
    with open(os.path.join(_HERE, "PLANS.md"), "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote PLANS.md ({len(ENTRIES)} entries)")
    spark.stop()


if __name__ == "__main__":
    main()
