"""Z-order clustering and compaction: measured file-skipping and file-count
invariants (write-time layout quality, SURVEY.md §4.3)."""

from __future__ import annotations

from pyspark.sql import functions as F

from duckdb_hybrid_doc_search_spark.index.catalog import load_table
from duckdb_hybrid_doc_search_spark.index.maintenance import (
    compact_parquet_dir, pruned_fraction, write_zordered, zvalue)


def test_zvalue_interleaves_bits(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535)], "a long, b long"
    )
    got = [r.z for r in df.select(zvalue(F.col("a"), F.col("b"))
                                  .alias("z")).collect()]

    def morton(a, b):
        z = 0
        for i in range(16):
            z |= ((a >> i) & 1) << (2 * i + 1) | ((b >> i) & 1) << (2 * i)
        return z

    assert got == [morton(a, b) for a, b in
                   [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535)]]


def test_zorder_skips_files_on_both_predicates(spark, sf_dir, tmp_path):
    """A two-predicate point-ish query must skip MOST files of the
    z-ordered layout, and strictly more than a layout sorted on only the
    SECOND column (where the first predicate can't prune)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    zdir = str(tmp_path / "zorder")
    write_zordered(li, zdir, "l_partkey", "l_suppkey", n_files=16)

    box_a, box_b = (10, 20), (1, 3)
    frac_z = pruned_fraction(zdir, "l_partkey", "l_suppkey", box_a, box_b)
    assert frac_z >= 0.5, frac_z

    sdir = str(tmp_path / "sorted_b")
    (
        li.repartitionByRange(16, "l_suppkey")
        .sortWithinPartitions("l_suppkey")
        .write.mode("overwrite").parquet(sdir)
    )
    frac_s = pruned_fraction(sdir, "l_partkey", "l_suppkey", box_a, box_b)
    assert frac_z > frac_s, (frac_z, frac_s)

    # clustering never loses rows
    n = spark.read.parquet(zdir).count()
    assert n == li.count()


def test_deterministic_zorder_buckets_rebuild_identically(spark, sf_dir,
                                                          tmp_path):
    """The r13 oracle-derivable layout contract (r12 VERDICT #8): two
    independent builds of write_zordered_buckets produce IDENTICAL
    per-file stats boxes (equal-width integer bucket arithmetic — no
    sampled range boundaries), rows survive, and the z layout still
    out-prunes the single-column baseline on the off-column probe."""
    from duckdb_hybrid_doc_search_spark.index.maintenance import (
        file_stats, skipped_files, write_sorted_buckets,
        write_zordered_buckets)

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    d1, d2 = str(tmp_path / "z1"), str(tmp_path / "z2")
    write_zordered_buckets(li, d1, "l_partkey", "l_suppkey", 16)
    write_zordered_buckets(li, d2, "l_partkey", "l_suppkey", 16)
    boxes = lambda d: sorted(  # noqa: E731  (drop file names: task ids vary)
        t[1:] for t in file_stats(d, "l_partkey", "l_suppkey"))
    assert boxes(d1) == boxes(d2) and len(boxes(d1)) > 1
    assert spark.read.parquet(d1).count() == li.count()

    sdir = str(tmp_path / "sb")
    write_sorted_buckets(li, sdir, "l_suppkey", 16)
    _, z_p = skipped_files(d1, "l_partkey", "l_suppkey",
                           (10, 20), (0, 1 << 40))
    _, s_p = skipped_files(sdir, "l_partkey", "l_suppkey",
                           (10, 20), (0, 1 << 40))
    assert z_p > s_p, (z_p, s_p)


def test_compaction_bounds_file_count(spark, tmp_path):
    path = str(tmp_path / "frag")
    spark.range(100_000).withColumn("v", F.col("id") * 2).repartition(
        40
    ).write.parquet(path)
    import os

    before = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
    assert before >= 40
    stats = compact_parquet_dir(spark, path, target_bytes=1 << 30)
    assert stats["files_after"] == 1
    df = spark.read.parquet(path)
    assert df.count() == 100_000
    assert df.agg(F.sum("v")).collect()[0][0] == 2 * sum(range(100_000))


def test_write_shards_lossless_and_bounded(spark, sf_dir):
    """Shard export: rows in == rows out, every shard under the
    maxRecordsPerFile bound per file, deterministic across reruns."""
    from duckdb_hybrid_doc_search_spark.plans.layout_queries import (
        SHARD_MAX_RECORDS,
        corpus_write_shards,
    )

    out1 = {r["shard"]: r for r in corpus_write_shards(spark, sf_dir).collect()}
    docs_n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r["n_docs"] for r in out1.values()) == docs_n
    for r in out1.values():
        # per-file bound: n_docs <= n_files * maxRecordsPerFile
        assert r["n_docs"] <= r["n_files"] * SHARD_MAX_RECORDS
    out2 = {r["shard"]: r for r in corpus_write_shards(spark, sf_dir).collect()}
    assert {k: (v["n_docs"], v["total_chars"]) for k, v in out1.items()} == {
        k: (v["n_docs"], v["total_chars"]) for k, v in out2.items()
    }
