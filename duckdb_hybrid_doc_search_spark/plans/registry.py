"""Registry of driver-checkable queries.

Every operator the engine claims (SURVEY.md §2 inventory + the LLM-pipeline
extensions) registers here as a (Spark callable, DuckDB oracle SQL) pair;
``__spark_entry__.py`` re-exports the registry to the correctness driver.
Oracle is None only for genuinely non-SQL-expressible ops (the driver then
records a weaker rows-only check).
"""

from __future__ import annotations

import os
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass
class QueryDef:
    name: str
    spark_fn: SparkQuery
    oracle: str | None
    bench: bool = True  # include in bench.py's timed loop
    # True = do NOT window-jump this round (late additions that would
    # otherwise displace higher-priority unchecked/RECHECK entries from
    # the gate's ~50-row window; they rotate in next round when the flag
    # is cleared alongside RECHECK)
    defer_gate: bool = False
    # True = calling spark_fn EXECUTES work (e.g. drives a bounded stream
    # to completion) rather than just building a plan — plan-only tools
    # (tools/audit_plans.py) must skip these. Explicit flag, not a name
    # convention (r4 ADVICE: a streaming query not named `streaming_*`
    # would have been executed during a plan-only audit).
    executes_on_build: bool = False


REGISTRY: dict[str, QueryDef] = {}


def register(name: str, oracle: str | None = None, bench: bool = True,
             defer_gate: bool = False, executes_on_build: bool = False):
    def deco(fn: SparkQuery) -> SparkQuery:
        REGISTRY[name] = QueryDef(name, fn, oracle, bench, defer_gate,
                                  executes_on_build)
        return fn

    return deco


def bench_queries() -> dict[str, SparkQuery]:
    """Queries included in the timed benchmark loop (excludes wrappers
    whose cost is dominated by third-party internals, e.g. MLlib
    approxSimilarityJoin — their correctness/recall is still tested)."""
    _load_all()
    return {n: qd.spark_fn for n, qd in REGISTRY.items() if qd.bench}


# Queries whose IMPLEMENTATION changed since their last green driver row —
# they jump the gate queue right after never-checked queries. Maps name ->
# round the change landed in: the flag SELF-CLEARS once a driver row from
# that round (or later) comes back green, so stale entries stop costing
# window slots without per-round manual cleanup.
RECHECK: dict[str, int] = {
    # (r4 entries — HUGEINT-cast fixes and the distributed_ntile rewrite —
    # all came back green in CORRECTNESS_r04 and self-cleared.)
    # bm25 probes: round 5 moved the layout fingerprint off the per-probe
    # path (index/fts_layout.py memo) — re-verify the probe results.
    "bm25_topk": 5,
    "bm25_batch_topk": 5,
    # round 5 capped per-basket fan-out (operators/mining.py BASKET_CAP)
    "basket_part_pairs": 5,
    # round 5 added edge-shape fixtures (setext/closers/CRLF/HTML-block/
    # tilde) — the registered result set grew; re-verify vs the oracle
    "markdown_chunk_fixtures": 5,
    # round 5 single-levenshtein rewrite (operators/mining.py spell_suggest)
    "search_spell_suggest": 5,
    # round 6: `types` now leaves the plan as array_join CSV (both sides)
    # so the driver's pandas canonicalizer can sort/hash the frame — the
    # raw array<string> column was CORRECTNESS_r05's one red row.
    "part_type_arrays": 6,
    # round 7: IVF centroid sets capped at fixed CENTROID_K
    # (knn.centroid_pred) and SemDeDup moved to k ~ sqrt(N) centroids
    # (dedup.semdedup_mod) — the r6 VERDICT #1 scale fix. At the
    # driver's sf0.01 the IVF cap is inactive (max vec_id 499 < MOD*K =
    # 800) so those results are value-identical; SemDeDup's centroid set
    # genuinely changed. Every query whose assignment/oracle formula
    # changed re-verifies:
    "ann_ivf_topk": 7,
    "ann_ivf_recall": 7,
    "ann_ivf_nprobe_curve": 7,
    "ann_ivf_append_probe": 7,
    "ann_ivfpq_topk": 7,
    "ann_ivfpq_residual_topk": 7,
    "ann_ivfpq_recall": 7,
    "ann_ivfpq_layout_probe": 7,
    "ann_sq8_layout_probe": 7,   # layout gained the _LAYOUT_DONE sentinel
    "dedup_semantic_cells": 8,   # r8: oracle stride now EXACT integer
    # sqrt (r7 ADVICE: floor(sqrt()) in double could diverge from
    # math.isqrt at boundary counts) — value-identical at sf0.01, but
    # the oracle text changed so re-verify
    "hybrid_search_ivf_fused": 7,
    # r8 (r7 ADVICE medium): Gopher bullet-line gate corrected to the
    # paper's >90% removal rule (was >10%), symbol ratio split per
    # symbol, and the "top" n-gram picked by max COUNT (tie-break longer
    # gram) instead of max character mass. Both queries have no driver
    # row yet (were defer_gate) so RECHECK is belt-and-braces.
    "text_gopher_quality": 8,
    # (text_gopher_repetition's r8 entry superseded by the r9 one below)
    # r9 (r8 VERDICT #5): _incremental_decide's exact tier restructured
    # (fp window + is_exact column instead of a re-joined id set; three
    # broadcast-build distincts dropped) — value-identical, but the
    # plan changed for both store-probe forms
    "dedup_incremental_batch": 9,
    "dedup_incremental_layout_probe": 9,
    # r9 (r8 VERDICT #2): the last three seeded-stand-in media rows
    # re-registered over REAL bytes — features/resize run the
    # magic-byte auto_pure seam over the mixed PNG+BMP corpus, video
    # frames demux+decode the concatenated-BMP containers; all three
    # gained formula oracles (were rows-only since r2)
    "media_image_features": 9,
    "media_resize_images": 9,
    "media_video_frames": 9,
    # r9 (r8 VERDICT #3): most-frequent-gram max now packs (cnt, glen)
    # into one long on both sides (was struct max) — value-identical
    # order, but both the plan and the oracle text changed; the funnel
    # composes the same aggregate
    "text_gopher_repetition": 9,
    "corpus_filter_funnel": 9,
    # r9: GIF joined the mixed-format dispatch row (third codec in the
    # union oracle; operator now dispatches gif payloads too)
    "media_mixed_decode_stats": 9,
    # r9 (r8 VERDICT #6): three layout rows upgraded from rows-only to
    # oracle-gated — compaction dropped the writer-dependent byte count
    # from its output, the prune layout now writes one file per year
    # dir (repartition by o_year), and the shard export's file counts
    # are pinned to the ceil(n/maxRecordsPerFile) formula
    "corpus_write_shards": 9,
    "lineitem_compaction_stats": 9,
    "orders_partition_prune_stats": 9,
    # r9 (r8 VERDICT #4): the streaming ingestion-dedup loop's decisions
    # now land in a batch-id-keyed parquet sink (driver dict removed)
    # and appends key on the micro-batch id — value-identical, but the
    # executed path changed
    "streaming_incremental_dedup": 9,
    # r10 (r9 VERDICT #1): IVF nlist is now DERIVED from the corpus
    # count at build time (knn.derive_nlist ~ sqrt(N), floor 16) and
    # frozen in the layout meta, replacing the global CENTROID_K=16 —
    # at the driver's sf0.01 (5000 vectors) nlist is 70, so every IVF
    # centroid set, cell assignment, and probe result genuinely changes
    # (verified vs the updated oracles at sf0.01 before registering)
    "ann_ivf_topk": 10,
    "ann_ivf_recall": 10,
    "ann_ivf_nprobe_curve": 10,
    "ann_ivf_append_probe": 10,
    "ann_ivfpq_topk": 10,
    "ann_ivfpq_residual_topk": 10,
    "ann_ivfpq_recall": 10,
    "ann_ivfpq_layout_probe": 10,
    "ann_ivfpq_append_probe": 10,
    "hybrid_search_ivf_fused": 10,
    # r10: decide_batch_against_store pins bfp/bsig via localCheckpoint
    # for one-shot callers (the r9 advisor fix had traded the cache
    # leak for a per-consumer minhash recompute) — value-identical,
    # but the executed path changed for both store-probe forms
    "dedup_incremental_batch": 10,
    "dedup_incremental_layout_probe": 10,
    # r10: folded-store probes short-circuit through segment_fts_index's
    # probe_only scored-table memo — value-identical, but the probe
    # plan construction changed after the query was registered, so pull
    # it into this round's window instead of the deferred r11 slot
    "bm25_folded_layout_probe": 10,
    # r11 (r10 VERDICT #6): GIF disposal method 3 (restore-to-previous)
    # implemented; the gifanim fixture corpus gained restore.gif, so the
    # registered result set grew by three composited-frame rows
    "media_gif_frames": 11,
    # r11: the nprobe curve now reads the persisted layout's stored
    # assignment (two-column scan) instead of the in-plan O(N x nlist)
    # crossJoin — value-identical (append-equivalence contract), plan
    # changed
    "ann_ivf_nprobe_curve": 11,
    # r11 (self-review): ivf_partitioned_topk now delegates to
    # ivf_frozen_layout_topk (probe reads the _centroids side table
    # instead of re-deriving via ivf_assign) — value-identical, plan
    # changed for both layout-probe queries
    "ann_ivf_topk": 11,
    "ann_ivf_append_probe": 11,
    # r12 (r11 VERDICT #2): dedup_embedding_ivf widened to top-2
    # multi-probe cell assignment (written layout + oracle rn <= 2 +
    # DISTINCT) — the result SET genuinely grows (boundary pairs
    # recovered), so the r11 green row no longer covers it
    "dedup_embedding_ivf": 12,
    # r12 (r11 VERDICT #6): the stdlib baseline JPEG codec landed —
    # the three JPEG fixtures joined the mixed-format corpus, so all
    # three mixed rows' result sets grow (new fixture rows + new
    # oracle CTEs)
    "media_image_features": 12,
    "media_resize_images": 12,
    "media_mixed_decode_stats": 12,
    # r13 (r12 VERDICT #4): the BPE trainer applies batches of
    # provably non-interacting merges per pass (bpe._select_merge_batch)
    # — merge table pinned identical to sequential at 256 merges, but
    # the executed path changed
    "text_bpe_train": 13,
    # r13 (r12 ADVICE): dedup_components_star confirms its fixpoint
    # with an exact exceptAll identity check — value-identical, one
    # extra bounded join in the executed path
    "dedup_components_star": 13,
    # r13 (r12 VERDICT #5): multi-probe width widened 2 -> 3
    # (DEDUP_IVF_NPROBE) after the recall/cost sweep — recall 0.71 ->
    # 0.92 at sf0.01; the result SET genuinely grows, so the r12 green
    # row no longer covers it (oracle mirrors with rn <= 3)
    "dedup_embedding_ivf": 13,
    # r13: the three PROGRESSIVE JPEG fixtures joined the mixed-format
    # corpus (SOF2 decode landed), so all three mixed rows' result sets
    # grow again — same shape as the r12 baseline-JPEG entries
    "media_image_features": 13,
    "media_resize_images": 13,
    "media_mixed_decode_stats": 13,
}


def _check_history() -> dict[str, tuple[int, bool, str | None]]:
    """name -> (newest round with a driver row, green at that round,
    err string at that round or None).

    The external gate only verifies the first ~50 entries of ``queries()``
    per round, so ordering is coverage policy. Reading the UNION of all
    CORRECTNESS_r{N}.json files (latest status wins) lets the ordering
    distinguish "never had a driver row" (highest priority) from "green
    two rounds ago" (rotates by staleness) — keying off only the newest
    file would mark everything outside its 50-row window as unchecked and
    starve genuinely-new queries of slots.
    """
    import glob
    import json
    import re

    here = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)
    )))
    hist: dict[str, tuple[int, bool, str | None]] = {}
    rounds: list[tuple[int, dict]] = []
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        try:
            with open(path) as f:
                data = json.load(f)
        except (OSError, json.JSONDecodeError):
            continue
        if isinstance(data, dict):
            rounds.append((int(m.group(1)), data))
    for n, data in sorted(rounds):
        for name, row in data.items():
            green = bool(
                isinstance(row, dict)
                and row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match", True)
                and not row.get("err")
            )
            err = row.get("err") if isinstance(row, dict) else None
            hist[name] = (n, green, str(err) if err else None)
    return hist


def _gate_ordered() -> list[str]:
    hist = _check_history()

    # An ``err: no_oracle`` driver row is TERMINAL: the driver cannot
    # check oracle-less entries at all (r5 burned ~20 of ~50 window
    # slots proving this), so retrying them every round starves real
    # coverage. They park behind the green tail — except ONE rotating
    # probe slot (the stalest such entry) kept in case the driver
    # gains rows-only checking later.
    no_oracle_parked = {
        name for name, (_, green, err) in hist.items()
        if not green and err == "no_oracle"
        and name in REGISTRY and REGISTRY[name].oracle is None
    }
    probe = (min(no_oracle_parked, key=lambda n: hist[n][0])
             if no_oracle_parked else None)

    def rank(item: tuple[int, tuple[str, QueryDef]]) -> tuple[int, int, int]:
        order, (name, qd) = item
        checked = hist.get(name)
        if qd.defer_gate and checked is None and name not in RECHECK:
            # late additions held back one round so they don't displace
            # the priority set from the window. Applies ONLY while the
            # query has no driver history: once checked (esp. a FAILED
            # row) or RECHECK-flagged, the normal tiers govern — a stale
            # defer flag must never park a red query out of the window.
            return (4, 0, order)
        if qd.oracle is None:
            # rows-only: weaker signal, but nonzero — a never-checked
            # entry still earns one probe row; after that, no_oracle
            # errs are terminal (see above), other errs retry.
            if checked is None:
                return (2, 0, order)
            last_round, green, err = checked
            if name in no_oracle_parked:
                if name == probe:
                    return (2, 1, last_round)  # rotating probe slot
                return (5, 0, last_round)  # terminal: behind green tail
            if not green:
                return (2, 1, last_round)  # genuine err row: retry
            return (3, 0, last_round)
        if checked is None:
            return (0, 0, order)  # never had any driver row: jump the queue
        last_round, green, _err = checked
        recheck_pending = (
            name in RECHECK and (last_round < RECHECK[name] or not green)
        )
        if recheck_pending or not green:
            return (1, 0, order)  # impl changed or last check failed
        return (3, 0, last_round)  # green tail: stalest check rotates first

    items = list(enumerate(REGISTRY.items()))
    return [n for _, (n, _) in sorted(items, key=rank)]


def queries() -> dict[str, SparkQuery]:
    _load_all()
    return {name: REGISTRY[name].spark_fn for name in _gate_ordered()}


def oracle_sql() -> dict[str, str]:
    _load_all()
    return {
        name: REGISTRY[name].oracle
        for name in _gate_ordered()
        if REGISTRY[name].oracle is not None
    }


_LOADED = False


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    global _LOADED
    if _LOADED:
        return
    from . import (analytics_queries, chunker_queries,  # noqa: F401
                   doc_search_queries, layout_queries, mining_queries,
                   mllib_queries, multimodal_queries, pipeline_queries,
                   relational_queries, sql_queries, streaming_queries)

    _LOADED = True
