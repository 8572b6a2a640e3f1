"""Binned range join — interval containment with NO equi key.

`operators/events.session_event_stats` rides its range predicate on a
user_id equi key; when no such key exists, a naive range join is a cross
join with a post-filter (|L|x|R| pairs — dead at scale). The standard
rewrite bins the value axis: each interval explodes into the fixed-width
buckets it covers, each point maps to its one bucket, the join becomes an
EQUI join on the bucket, and the exact predicate filters the survivors.
Pair space shrinks from |L|x|R| to sum over buckets of
|intervals covering b| x |points in b| — bounded by bucket width times
local density, the same locality trade as the IVF cells.

Spark-specific notes:
- the bucket explode is `sequence()` + `explode` (codegen, no Python);
- an interval spanning k buckets appears k times, but each (interval,
  point) pair survives the exact filter in EXACTLY the point's bucket,
  so no distinct pass is needed (no duplicate pairs by construction);
- bucket width trades replication (wide intervals -> few copies) against
  selectivity (narrow buckets -> fewer false pairs); callers pass a width
  near the median interval length.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bin_range_join(intervals: DataFrame, points: DataFrame,
                   lo_col: str, hi_col: str, point_col: str,
                   bucket_width: int) -> DataFrame:
    """Pairs (interval row, point row) where lo <= point <= hi, via
    bucket equi-join. Columns of both inputs are preserved; callers
    alias ahead of time to avoid collisions."""
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")

    def bucket_of(c: Column) -> Column:
        return F.floor(c / F.lit(bucket_width)).cast("long")

    binned_iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                bucket_of(F.col(lo_col)), bucket_of(F.col(hi_col))
            )
        ),
    )
    binned_pt = points.withColumn("__bucket", bucket_of(F.col(point_col)))
    return (
        binned_iv.join(binned_pt, "__bucket")
        .where(
            (F.col(point_col) >= F.col(lo_col))
            & (F.col(point_col) <= F.col(hi_col))
        )
        .drop("__bucket")
    )
