"""Driver-contract schema gate (VERDICT r4 #2).

The driver's correctness canonicalizer sorts result rows in pandas;
array/map-typed columns are unhashable there and make the key RED at
the driver even when the values are semantically right (the r4
``dedup_cluster_keep`` failure).  This gate asserts — at plan time, no
execution — that NO registered query's result schema contains a
collection-typed column, and that the selfcheck canonicalizer itself
rejects such frames (so the lenient-local/strict-driver split can
never reopen).
"""

from __future__ import annotations

import sys
from pathlib import Path

import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entry  # noqa: E402

SF_SMOKE = "/root/testdata/sf0.001"

_COLLECTION_TYPES = ("ArrayType", "MapType", "StructType")


def test_no_collection_columns_in_any_registered_query(spark):
    """Every registry key — in-cap AND demoted — must return a
    scalar-only schema.  Demoted keys are included because the 50-key
    cap boundary moves whenever a key is added (builder memory:
    ks[46:50] churn), so a demoted array-returning key is a landmine.

    Nothing here collects RESULTS, but constructing some queries does
    run bounded Spark jobs (eager localCheckpoints, the CC route
    probe) — this gate is about result schemas, not about being a
    static/no-execution check."""
    offenders = {}
    for name, fn in entry.queries().items():
        df = fn(spark, SF_SMOKE)  # definition only — results never collected
        bad = [
            f.name
            for f in df.schema.fields
            if type(f.dataType).__name__ in _COLLECTION_TYPES
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, (
        "registry queries return collection-typed columns (driver-fatal): "
        f"{offenders} — stringify with concat_ws/array_to_string "
        "(the dedup_exact pattern, entry_queries.dedup_exact)"
    )


def test_selfcheck_canon_rejects_list_columns():
    """The r4 failure mode must reproduce locally: a list-valued column
    fails canonicalization instead of being silently tuple-ified."""
    from tools.selfcheck import canon, compare

    good = pd.DataFrame({"a": [2, 1], "b": ["y", "x"]})
    out = canon(good)
    assert list(out["a"]) == [1, 2]

    bad = pd.DataFrame({"a": [1, 2], "members": [[1, 2], [3]]})
    with pytest.raises(TypeError, match="array/map-typed"):
        canon(bad)

    # and compare() degrades to a recorded problem, not a crash
    problems = compare("k", bad, bad.copy())
    assert any("canonicalize" in p for p in problems)


def test_selfcheck_canon_allows_scalar_object_columns():
    """Strings/None in object columns are fine — only collections die."""
    from tools.selfcheck import canon

    df = pd.DataFrame({"s": ["b", None, "a"]})
    out = canon(df)
    assert out["s"].iloc[0] is None or pd.isna(out["s"].iloc[0])
    assert list(out["s"].iloc[1:]) == ["a", "b"]
