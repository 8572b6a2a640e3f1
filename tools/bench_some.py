"""Isolate-time a subset of registered queries (bench.py methodology:
noop sink, first run compiles, report min of N timed runs).

Usage: python tools/bench_some.py q1 q2 ...   [env: SPARK_GRAFT_SF_DIR,
SPARK_GRAFT_CPUS, BENCH_SOME_RUNS (default 2)]

Prints one line per query: name, compile-run sec, min timed sec.
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
    runs = int(os.environ.get("BENCH_SOME_RUNS", "2"))
    names = sys.argv[1:]
    qs = registry.bench_queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        print("unknown queries:", unknown, file=sys.stderr)
        sys.exit(2)
    spark = get_spark("bench-some")
    from pyspark.sql import functions as F
    warm = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    warm.groupBy("lang").agg(F.count(F.lit(1))).write.format("noop").mode(
        "overwrite").save()
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"bench-some:{name}")
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        spark.catalog.clearCache()
        print(f"{name}  compile={compile_s:.3f}s  min={best:.3f}s",
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
