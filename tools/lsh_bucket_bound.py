"""Measured linear-vs-quadratic emitted-pair counts for the bounded LSH
hot-bucket treatment (r13 VERDICT #1) — the SCALING.md evidence run.

Builds a corpus with one boilerplate cluster of M identical docs plus a
fixed organic tail, then counts emitted pairs and wall time for the
unbounded band self-join vs the star-bounded form at M = BASE x 1/10/100.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from duckdb_hybrid_doc_search_spark.operators import dedup  # noqa: E402
from duckdb_hybrid_doc_search_spark.session import get_spark  # noqa: E402


def corpus(spark, m: int):
    rows = [(i, "empty page please enable javascript to view this site "
                "copyright footer terms privacy") for i in range(m)]
    rows += [
        (m, "the quick brown fox jumps over the lazy dog again today"),
        (m + 1, "the quick brown fox jumps over the lazy cat again today"),
        (m + 2, "completely unrelated content about distributed query engines"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def main() -> None:
    spark = get_spark("lsh-bound", cpus=8)
    base = 20
    print(f"{'M':>6} {'unbounded pairs':>16} {'wall_s':>7} "
          f"{'bounded pairs':>14} {'wall_s':>7}")
    for mult in (1, 10, 100):
        m = base * mult
        docs = corpus(spark, m).cache()
        docs.count()
        t0 = time.time()
        nu = dedup.dedup_minhash_lsh(docs).count()
        tu = time.time() - t0
        t0 = time.time()
        nb = dedup.dedup_minhash_lsh_bounded(docs, cap=8).count()
        tb = time.time() - t0
        print(f"{m:>6} {nu:>16} {tu:>7.2f} {nb:>14} {tb:>7.2f}")
        docs.unpersist()


if __name__ == "__main__":
    main()
