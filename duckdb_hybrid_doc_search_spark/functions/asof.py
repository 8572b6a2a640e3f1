"""Generic as-of join — an operator Spark lacks natively (DataFrame API
has no merge_asof; stream-stream interval joins emit ALL matches in
range, not the latest).

Implemented as the union-and-carry pattern (same technique as the
click→purchase specialization in operators/events.py, generalized):
tag both sides, union on aligned columns, window-sort per key with right
rows ordering before left rows at equal timestamps, carry the latest
right-side values forward with last(ignoreNulls), keep left rows. ONE
shuffle on the key — no range-join explosion, no per-row Python.

This is the backward (most common) direction: for each left row, the
latest right row with r.ts <= l.ts on the same key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join_backward(left: DataFrame, right: DataFrame, key: str,
                       ts: str, value_cols: list[str],
                       suffix: str = "_asof") -> DataFrame:
    """For each left row: latest right row with right.ts <= left.ts per key.

    Output: every left column, plus `<c><suffix>` for each of right's
    `value_cols` (NULL when no prior right row). Ties on ts resolve to the
    right row (right sorts first at equal timestamps), matching
    pandas.merge_asof(allow_exact_matches=True).
    """
    lcols = left.columns
    l_tag = left.select(
        F.col(key).alias("__k"),
        F.col(ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*lcols).alias("__lrow"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in value_cols],
    )
    r_tag = right.select(
        F.col(key).alias("__k"),
        F.col(ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(
            l_tag.schema["__lrow"].dataType
        ).alias("__lrow"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    )
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = l_tag.unionByName(r_tag).select(
        "__side",
        "__lrow",
        *[
            F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(
                f"__c_{c}"
            )
            for c in value_cols
        ],
    )
    return carried.where(F.col("__side") == 1).select(
        *[F.col(f"__lrow.{c}").alias(c) for c in lcols],
        *[F.col(f"__c_{c}").alias(f"{c}{suffix}") for c in value_cols],
    )
