"""Skew-mitigation: salted joins for hot keys.

AQE's skew-join handles most runtime skew (enabled in session.py), but a
KNOWN-hot key (a boilerplate shingle, a bot user_id, an empty-string
token) is better salted explicitly: replicate the small side S ways,
scatter the big side's hot rows across the S replicas, join, and the
result is IDENTICAL to the plain join — asserted in tests — while the hot
key's work spreads over S tasks instead of one straggler.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(big: DataFrame, small: DataFrame, key: str,
                num_salts: int = 8, how: str = "inner") -> DataFrame:
    """Equi-join `big ⋈ small` on `key`, salted.

    big rows get a random-ish but DETERMINISTIC salt (hash of the full row
    via monotonically_increasing_id is not deterministic across runs —
    pmod of a content hash is), small rows are replicated once per salt.
    Result columns = big's + small's (minus the duplicate key).

    Result-identical to the plain join only for join types where an
    unmatched SMALL-side row produces no output: the small side is
    exploded num_salts times, so right/full outer would emit each
    unmatched small row once per salt — those types are rejected.
    """
    allowed = {"inner", "left", "leftouter", "left_outer", "left_semi",
               "leftsemi", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        # "cross" is rejected too: the [key, __salt] equi-condition would
        # silently degrade it to an inner equi-join
        raise ValueError(
            f"salted_join does not support how={how!r}: the replicated "
            "small side would duplicate unmatched rows under right/full "
            "outer joins, and 'cross' would silently become inner"
        )
    salt_col = F.pmod(
        F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(num_salts)
    ).cast("int")
    b = big.withColumn("__salt", salt_col)
    s = small.select(
        "*", F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1))).alias("__salt")
    )
    out = b.join(s, [key, "__salt"], how)
    return out.drop("__salt")
