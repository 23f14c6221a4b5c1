"""Plan-hygiene gate (VERDICT r1 #6): the physical-plan expectations in
tools/explain_audit.py — pushed filters, pruned ReadSchemas, broadcast
joins, WindowGroupLimit, Arrow-only Python — must hold in CI, so a
regression (e.g. a dropped F.broadcast hint) fails pytest, not just the
manual tool."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.explain_audit import audit  # noqa: E402


def test_plan_hygiene_expectations_hold(spark):
    results = audit(spark)
    failures = {k: p for k, p in results.items() if p}
    assert not failures, failures
