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
    # Right-side values ride in ONE struct: last(ignorenulls) then skips
    # only the left-row placeholders, never a genuinely-NULL field inside
    # a right row, and all carried columns come from the SAME right row
    # (per-column carries could stitch together a row that never existed).
    l_tag = left.select(
        F.col(key).alias("__k"),
        F.col(ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*lcols).alias("__lrow"),
        F.lit(None).cast(
            right.select(
                F.struct(
                    *[F.col(c) for c in value_cols]
                ).alias("s")
            ).schema["s"].dataType
        ).alias("__rvals"),
    )
    r_tag = right.select(
        F.col(key).alias("__k"),
        F.col(ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(
            l_tag.schema["__lrow"].dataType
        ).alias("__lrow"),
        F.struct(*[F.col(c) for c in value_cols]).alias("__rvals"),
    )
    # __rvals as the final sort key makes ties on (ts, side) total and
    # deterministic: among right rows at the same timestamp the
    # lexicographically greatest value tuple wins — matching
    # pandas.merge_asof on right input sorted by (ts, value_cols)
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side", "__rvals")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = l_tag.unionByName(r_tag).select(
        "__side",
        "__lrow",
        F.last("__rvals", ignorenulls=True).over(w).alias("__c"),
    )
    return carried.where(F.col("__side") == 1).select(
        *[F.col(f"__lrow.{c}").alias(c) for c in lcols],
        *[F.col(f"__c.{c}").alias(f"{c}{suffix}") for c in value_cols],
    )
