"""Capture .explain('formatted') for named registered queries into files.

Usage: python tools/explain_some.py OUTDIR [SUFFIX] -- q1 q2 ...
Writes OUTDIR/<query><SUFFIX>.txt (SUFFIX defaults to empty; pass e.g.
_before / _after). Plan-only: skips executes_on_build queries.
"""

from __future__ import annotations

import os
import sys

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _HERE)
os.environ["PYTHONPATH"] = _HERE + os.pathsep + os.environ.get("PYTHONPATH", "")

from duckdb_hybrid_doc_search_spark.plans import registry  # noqa: E402
from duckdb_hybrid_doc_search_spark.session import get_spark  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sep = args.index("--")
    outdir = args[0]
    suffix = args[1] if sep == 2 else ""
    names = args[sep + 1:]
    os.makedirs(outdir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("explain-some")
    registry._load_all()
    for name in names:
        qd = registry.REGISTRY[name]
        if qd.executes_on_build:
            print(f"{name}: skipped (executes_on_build)")
            continue
        df = qd.spark_fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"))
        path = os.path.join(outdir, f"{name}{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"{name}: {path} ({plan.count('Exchange')} Exchange refs)")
    spark.stop()


if __name__ == "__main__":
    main()
