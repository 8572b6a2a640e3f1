"""Split a registered query's wall time into plan phases.

Usage: python tools/profile_some.py q1 q2 ...   [env: SPARK_GRAFT_SF_DIR,
SPARK_GRAFT_CPUS, PROFILE_RUNS (default 2)]

Per query, after one discarded compile run (bench.py methodology), the
best timed run is decomposed as:
  build   — Python DataFrame construction (analysis included lazily)
  plan    — queryExecution().executedPlan() materialization
            (analysis + optimization + physical planning, pre-AQE)
  exec    — noop write of the pre-built frame (includes AQE re-planning)
The bench's timed region is build + plan + exec of a FRESH frame, so
`build+plan` bounds the driver-side planning share of the recorded number.
"""

from __future__ import annotations

import os
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)
os.environ["PYTHONPATH"] = _HERE + os.pathsep + os.environ.get("PYTHONPATH", "")

from duckdb_hybrid_doc_search_spark.plans import registry  # noqa: E402
from duckdb_hybrid_doc_search_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("PROFILE_RUNS", "2"))
    names = sys.argv[1:]
    qs = registry.bench_queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        print("unknown queries:", unknown, file=sys.stderr)
        sys.exit(2)
    spark = get_spark("profile-some")
    from pyspark.sql import functions as F
    warm = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    warm.groupBy("lang").agg(F.count(F.lit(1))).write.format("noop").mode(
        "overwrite").save()
    print(f"{'query':<36} {'build':>7} {'plan':>7} {'exec':>7} {'total':>7}")
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = (float("inf"),) * 4
        for _ in range(runs):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t3 = time.perf_counter()
            if t3 - t0 < best[3]:
                best = (t1 - t0, t2 - t1, t3 - t2, t3 - t0)
        spark.catalog.clearCache()
        print(f"{name:<36} {best[0]:7.3f} {best[1]:7.3f} {best[2]:7.3f}"
              f" {best[3]:7.3f}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
