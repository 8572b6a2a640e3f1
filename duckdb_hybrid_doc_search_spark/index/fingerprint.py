"""Cheap staleness fingerprints for written index layouts.

Two tiers, used by ``fts_layout`` / ``ivf_layout`` cache keys:

1. ``source_file_fingerprint`` — driver-side ``os.stat`` over the plan's
   input files (path, size, mtime). ZERO Spark jobs, so a warm probe of a
   written layout pays no corpus scan just to prove the layout is fresh.
   Regenerated testdata changes mtime/size -> new key -> rebuild. Only
   valid for local files; returns None for non-file schemes or fileless
   plans (pure in-memory DataFrames), where the caller falls back to tier 2.
2. ``content_fingerprint`` — one aggregate scan: count + sum(xxhash64 of
   the identifying columns), order-independent and value-sensitive (edited
   values with stable ids still rebuild).

The file tier hashes FILES, not plans: two different projections of the
same parquet get the same fingerprint. Layout caches therefore also key on
a caller-supplied ``name`` that identifies the logical corpus.
"""

from __future__ import annotations

import hashlib
import os
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


FileSig = tuple[tuple[str, int, int], ...]


def warehouse_root(leaf: str, root: str | None = None) -> str:
    """Default layout root: ``<repo>/spark-warehouse/<leaf>``, unless
    the caller supplied an explicit ``root``. One definition for every
    written layout (fts/ivf/ivfpq/sq8/dedup) — the repo-root derivation
    must change in exactly one place."""
    if root is not None:
        return root
    repo_dir = os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))
    ))
    return os.path.join(repo_dir, "spark-warehouse", leaf)


def source_file_stats(df: DataFrame) -> FileSig | None:
    """Sorted (path, size, mtime_ns) over the plan's input files, or None
    when the plan is fileless / remote. The signature is re-checkable with
    pure ``os.stat`` (see ``stat_sig``) — layout caches use that for a
    zero-JVM-call freshness probe on the warm path."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    parts: list[tuple[str, int, int]] = []
    for uri in sorted(files):
        parsed = urlparse(uri)
        if parsed.scheme not in ("", "file"):
            return None  # remote FS: stat not available driver-side
        path = unquote(parsed.path) or uri
        try:
            st = os.stat(path)
        except OSError:
            return None
        parts.append((path, st.st_size, st.st_mtime_ns))
    return tuple(parts)


def stat_sig(paths: list[str]) -> FileSig:
    """Current (path, size, mtime_ns) for `paths`; raises OSError if any
    is gone (caller treats that as stale)."""
    out = []
    for p in paths:
        st = os.stat(p)
        out.append((p, st.st_size, st.st_mtime_ns))
    return tuple(out)


def sig_fingerprint(sig: FileSig) -> str:
    digest = hashlib.sha256(
        "|".join(f"{p}:{s}:{m}" for p, s, m in sig).encode()
    ).hexdigest()[:16]
    return f"f{digest}"


def source_file_fingerprint(df: DataFrame) -> str | None:
    """Hash of sorted (path, size, mtime_ns) over the plan's input files."""
    sig = source_file_stats(df)
    return None if sig is None else sig_fingerprint(sig)


def content_fingerprint(df: DataFrame, *cols: str) -> str:
    """Order-independent content hash: count + sum(xxhash64(cols)).

    Complex-typed columns (e.g. array<float> embeddings) are rendered via
    cast(string) so they participate in the hash.
    """
    atomic = {
        "string", "integer", "long", "short", "byte", "float", "double",
        "boolean", "date", "timestamp", "decimal",
    }
    hash_cols = [
        F.col(c) if df.schema[c].dataType.typeName() in atomic
        else F.col(c).cast("string")
        for c in cols
    ]
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        # decimal sum: immune to ANSI long-overflow on the hash sum
        F.sum(F.xxhash64(*hash_cols).cast("decimal(38,0)")).alias("h"),
    ).collect()[0]
    return f"c{row['n']}-{int(row['h'] or 0) & 0xFFFFFFFFFFFFFFFF:x}"


def layout_fingerprint(df: DataFrame, *cols: str) -> str:
    """File-stat fingerprint when available, else one content scan."""
    return source_file_fingerprint(df) or content_fingerprint(df, *cols)
