"""Regression gate for the automated scale-anti-pattern audit: every
registered query's plan must be free of cartesian products, Python
row-stages, unpartitioned windows, and single-partition global sorts —
except the explicitly allowlisted, documented-bounded occurrences in
tools/audit_plans.py."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent / "tools"))


def test_no_unallowlisted_scale_antipatterns(spark, sf_dir):
    import audit_plans

    violations, allowlisted, errors = audit_plans.audit(spark, sf_dir)
    assert not errors, errors
    assert not violations, violations
    # every allowlist reason must be non-empty (enforced by construction,
    # but keep the invariant visible)
    for entries in allowlisted.values():
        for e in entries:
            assert "[bounded: " in e
