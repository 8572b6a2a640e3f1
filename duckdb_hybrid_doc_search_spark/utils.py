"""Small shared helpers."""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal


def round_half_up(x: float, ndigits: int) -> float:
    """Round like Spark's ``F.round`` / SQL ROUND (HALF_UP on the exact
    binary value) — NOT like Python's builtin ``round`` (banker's), whose
    ties-to-even differs on exact .5 boundaries. Any driver-side score
    arithmetic that must agree with engine-computed scores uses this.
    """
    q = Decimal(1).scaleb(-ndigits)
    # Decimal(repr(x)), not Decimal(x): Spark rounds the SHORTEST decimal
    # representation (Java BigDecimal.valueOf -> Double.toString), not the
    # exact binary expansion — e.g. 1.2391595 (binary ...94999) rounds to
    # 1.23916 in Spark but 1.239159 on the exact value.
    return float(Decimal(repr(float(x))).quantize(q, rounding=ROUND_HALF_UP))
