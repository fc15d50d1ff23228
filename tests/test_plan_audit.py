"""The physical-plan audit is a test gate: no catalog query may regress
into a cartesian product, an un-allowlisted nested-loop join, or
row-at-a-time Python (see tools/plan_audit.py for the rationale)."""

from __future__ import annotations

from tools.plan_audit import audit


def test_all_catalog_plans_are_scale_clean(sf_dir):
    assert audit(sf_dir) == 0
