"""Benchmark harness: runs every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced through the full physical plan with the `noop` sink
(executes everything, writes nothing) so timings measure engine work, not
driver-side collect serialization.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from duckdb_hybrid_doc_search_spark.plans import registry
from duckdb_hybrid_doc_search_spark.session import get_spark


def _prior_round_timings(here: str) -> tuple[int | None, dict[str, float]]:
    """Per-query timings of the newest BENCH_r{N}.json, for the regression
    diff — so each round's judging can quote which queries moved."""
    best_n, timings = None, {}
    for path in glob.glob(os.path.join(here, "BENCH_r*.json")):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        n = int(m.group(1))
        if best_n is not None and n <= best_n:
            continue
        try:
            with open(path) as f:
                parsed = json.load(f).get("parsed") or {}
            qs = parsed.get("queries") or {}
            if qs:
                best_n, timings = n, qs
        except (json.JSONDecodeError, OSError):
            continue
    return best_n, timings


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).removeprefix("sf")
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf

    spark = get_spark("bench")
    qs = registry.bench_queries()

    # warm the JVM (codegen, shuffle machinery) + parquet footers so the
    # first timed query doesn't absorb one-time startup cost
    from pyspark.sql import functions as F
    warm = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    warm.groupBy("lang").agg(F.count(F.lit(1))).write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    total = 0.0
    for name, fn in sorted(qs.items()):
        # first execution compiles the plan (whole-stage codegen); then the
        # MIN of two timed runs approximates steady-state engine throughput
        # while shrugging off noisy-neighbor CPU contention on the host.
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 4)
        total += best

    out = {
        "metric": "all_registered_queries_wall",
        "value": round(total, 4),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
    }
    prior_round, prior = _prior_round_timings(
        os.path.dirname(os.path.abspath(__file__))
    )
    if prior:
        # >=1.5x AND >=0.25s absolute so sub-second jitter doesn't read
        # as a regression; "new" queries have no prior to diff against
        out["vs_round"] = prior_round
        out["regressions"] = {
            n: {"prev": prior[n], "now": t, "ratio": round(t / prior[n], 2)}
            for n, t in timings.items()
            if n in prior and prior[n] > 0
            and t >= prior[n] * 1.5 and t - prior[n] >= 0.25
        }
        out["new_queries"] = sorted(set(timings) - set(prior))
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
