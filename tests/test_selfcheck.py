"""The FULL-registry oracle gate, in pytest (VERDICT r3 #1).

Every key in ``__spark_entry__.queries()`` — including the ones past
the driver artifact's 50-key cap — runs on Spark and is compared
against its DuckDB oracle at sf0.01 (row count + schema + values).
This is the same check ``python tools/selfcheck.py`` performs; wiring
it here makes CI fail the moment ANY registered key breaks its oracle,
instead of only the first 50 the driver happens to record.
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tools.selfcheck import run_registry  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"


@pytest.mark.slow
def test_full_registry_matches_oracles(spark):
    failures = run_registry(spark, SF_DIR, log=lambda *_: None)
    assert not failures, "registry keys diverged from their oracles:\n" + "\n".join(
        f"  {k}: {p}" for k, p in failures
    )
