"""Automated scale-anti-pattern audit over EVERY registered query.

Run from the repo root:  python tools/audit_plans.py  [sf_dir]

For each query in the registry, inspects the executed plan for the
patterns that break at 100 TB and writes AUDIT.md:

- CartesianProduct            (unbounded pair blowup)
- BatchEvalPython             (row-at-a-time Python in the plan)
- Exchange SinglePartition    (all data through one task)
- unpartitioned Window        (single-partition global sort)

Findings are split into VIOLATIONS (fail the audit) and ALLOWLISTED
(documented-bounded occurrences — the allowlist entry must name the
bound). tests/test_audit.py runs the same audit and fails on any
non-allowlisted hit, so a regression cannot land silently.
"""

from __future__ import annotations

import os
import re
import sys

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)

# pattern -> (query name -> documented bound). Every entry must say WHY
# the occurrence is bounded; an empty reason is a bug.
ALLOWLIST: dict[str, dict[str, str]] = {
    "window_unpartitioned": {
        "corpus_pack_token_budget":
            "window rides the token-bucket histogram (<= 1000 rows)",
        "corpus_dsir_weights":
            "tq/tp totals window over the b-row hashed model table "
            "(<= DSIR_BUCKETS = 1024 rows)",
        "corpus_dsir_resample":
            "tq/tp totals window over the b-row hashed model table "
            "(<= DSIR_BUCKETS = 1024 rows)",
        "corpus_perplexity_buckets":
            "distributed_ntile offsets window over the per-partition "
            "counts table (<= shuffle.partitions rows)",
        "customer_rfm_segments":
            "distributed_ntile counts table (<= shuffle.partitions rows)",
        "lineitem_equi_depth_histogram":
            "distributed_ntile counts table (<= shuffle.partitions rows)",
        "orders_moving_average":
            "window over the per-day aggregate (calendar-bounded)",
        "orders_yoy_growth":
            "window over the per-year aggregate (calendar-bounded)",
        "events_daily_anomaly_mad":
            "window over the per-day aggregate (calendar-bounded)",
        "events_type_transition_matrix":
            "share-normalization window over the |types|^2 matrix",
        "customer_pareto_share":
            "running-share window partitioned per nation over the "
            "per-customer aggregate of that nation",
        "search_more_like_this":
            "rank over the probe's bounded candidate set (<= corpus "
            "matches of <= MLT_TERMS literal terms, top-k contract)",
        "search_snippets":
            "rank over the bounded top-k hit set (<= k rows)",
        "text_zipf_fit":
            "rank over the truncated top-{} vocabulary head".format(1000),
    },
    "exchange_single_partition": {
        "text_zipf_fit":
            "TakeOrdered truncation bounds the sorted set to the "
            "top-1000 head",
        "corpus_dsir_weights":
            "tq/tp totals window over the b-row hashed model table "
            "(<= DSIR_BUCKETS = 1024 rows)",
        "corpus_dsir_resample":
            "tq/tp totals window over the b-row hashed model table "
            "(<= DSIR_BUCKETS = 1024 rows)",
        # only Sort/Window consumers are flagged (see
        # single_partition_sort_lines); each allowlist entry names the
        # bound on what flows through the single partition
        "orders_moving_average":
            "global sort of the per-day aggregate (calendar-bounded)",
        "orders_yoy_growth":
            "global sort of the per-year aggregate (calendar-bounded)",
        "events_daily_anomaly_mad":
            "global sort of the per-day aggregate (calendar-bounded)",
        "corpus_pack_token_budget":
            "sort of the token-bucket histogram (<= 1000 rows)",
        "corpus_perplexity_buckets":
            "distributed_ntile counts table (<= shuffle.partitions rows)",
        "customer_rfm_segments":
            "distributed_ntile counts table (<= shuffle.partitions rows)",
        "lineitem_equi_depth_histogram":
            "distributed_ntile counts table (<= shuffle.partitions rows)",
        "events_type_transition_matrix":
            "sort of the |types|^2 transition matrix",
        "customer_pareto_share":
            "sort rides the per-nation aggregate",
        "search_more_like_this":
            "sort of the bounded candidate set (top-k contract)",
        "search_snippets":
            "sort of the bounded top-k hit set",
    },
    "python_stage": {
        # Arrow mapInPandas/applyInPandas crossings are the documented
        # model/ANN/chunker paths; BatchEvalPython (pickled row-at-a-
        # time) is never allowlisted in a HOT-PATH query. The single
        # exception is the deliberate API-coverage query:
        "udtf_sentence_split":
            "Python UDTF API-surface demo; the hot path uses the "
            "vectorized posexplode twin pinned equal in test_udtf.py",
    },
}

PATTERNS = {
    "cartesian": re.compile(r"CartesianProduct"),
    "python_stage": re.compile(r"BatchEvalPython"),
}
WINDOW_NODE = re.compile(r"^[+\-:* ]*Window \[")


def _indent(line: str) -> int:
    m = re.search(r"\+- ", line)
    return m.start() if m else -1


def single_partition_sort_lines(plan: str) -> list[str]:
    """Exchange SinglePartition nodes whose CONSUMER is a Sort or Window
    — the global-sort shape that breaks at scale. A single-partition
    exchange feeding a final aggregate merge (scalar aggregates, count
    rollups) is the canonical partial->final shape and is NOT flagged;
    GlobalLimit consumers (limit pushdown) are fine too."""
    lines = plan.splitlines()
    out = []
    for i, line in enumerate(lines):
        if "Exchange SinglePartition" not in line:
            continue
        my = _indent(line)
        parent = None
        for j in range(i - 1, -1, -1):
            pj = _indent(lines[j])
            if pj < my:
                parent = lines[j].strip().lstrip(":+- *")
                break
        if parent and re.match(r"(Sort|Window)\b", parent):
            out.append(f"consumed by {parent[:80]}")
    return out


def _balanced_args(s: str, start: int) -> str | None:
    """Contents of the parenthesized group opening at s[start] == '('."""
    depth = 0
    for i in range(start, len(s)):
        if s[i] == "(":
            depth += 1
        elif s[i] == ")":
            depth -= 1
            if depth == 0:
                return s[start + 1:i]
    return None


def _split_top_level(args: str) -> list[str]:
    """Split on commas at paren depth 0 only — a partition expression
    containing a function call (its own commas) stays one element."""
    parts, depth, cur = [], 0, []
    for ch in args:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return parts


def unpartitioned_window_lines(plan: str) -> list[str]:
    out = []
    for line in plan.splitlines():
        s = line.strip()
        if not WINDOW_NODE.match(s):
            continue
        m = re.search(r"windowspecdefinition\(", s)
        if not m:
            continue
        args = _balanced_args(s, m.end() - 1)
        if args is None:
            continue
        # partition columns precede the first sort direction; a spec whose
        # first TOP-LEVEL comma-element already carries ASC/DESC has no
        # partition (naive split misparsed function-call partition exprs —
        # the r4 ADVICE finding)
        first = _split_top_level(args)[0]
        if re.search(r"\b(ASC|DESC)\b", first):
            out.append(s[:160])
    return out


def audit(spark, sf_dir: str):
    from duckdb_hybrid_doc_search_spark.plans import registry

    registry._load_all()
    violations: dict[str, list[str]] = {}
    allowlisted: dict[str, list[str]] = {}
    errors: dict[str, str] = {}
    for name, qd in registry.REGISTRY.items():
        if qd.executes_on_build:
            continue  # building the plan would execute (streaming drives);
            # plan audit is batch-only — explicit flag, not name matching
        try:
            df = qd.spark_fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as ex:  # pragma: no cover - audit robustness
            errors[name] = str(ex)[:200]
            continue
        hits: list[tuple[str, str]] = []
        for key, pat in PATTERNS.items():
            if pat.search(plan):
                hits.append((key, key))
        for line in unpartitioned_window_lines(plan):
            hits.append(("window_unpartitioned", line))
        for line in single_partition_sort_lines(plan):
            hits.append(("exchange_single_partition", line))
        for key, detail in hits:
            reason = ALLOWLIST.get(key, {}).get(name)
            entry = f"{key}: {detail}" + (f"  [bounded: {reason}]"
                                          if reason else "")
            if reason:
                allowlisted.setdefault(name, []).append(entry)
            else:
                violations.setdefault(name, []).append(entry)
    return violations, allowlisted, errors


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from duckdb_hybrid_doc_search_spark.session import get_spark

    spark = get_spark("audit-plans")
    violations, allowlisted, errors = audit(spark, sf_dir)

    lines = [
        "# AUDIT — scale-anti-pattern sweep over every registered query",
        "",
        "Auto-generated by tools/audit_plans.py; gated by "
        "tests/test_audit.py (any non-allowlisted hit fails CI).",
        "",
        f"Queries audited: see registry; violations: {len(violations)}; "
        f"allowlisted (documented-bounded): {len(allowlisted)}; "
        f"audit errors: {len(errors)}",
        "",
        "## Violations",
        "",
    ]
    if violations:
        for name in sorted(violations):
            for e in violations[name]:
                lines.append(f"- **{name}** — {e}")
    else:
        lines.append("none")
    lines += ["", "## Allowlisted (each with its documented bound)", ""]
    for name in sorted(allowlisted):
        for e in allowlisted[name]:
            lines.append(f"- {name} — {e}")
    if errors:
        lines += ["", "## Audit errors", ""]
        for name in sorted(errors):
            lines.append(f"- {name}: {errors[name]}")
    with open(os.path.join(_HERE, "AUDIT.md"), "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote AUDIT.md: {len(violations)} violations, "
          f"{len(allowlisted)} allowlisted, {len(errors)} errors")


if __name__ == "__main__":
    main()
