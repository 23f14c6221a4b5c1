"""Property-based gates (hypothesis): randomized inputs against
pure-Python references for operators whose edge cases are easy to miss
with fixtures — span counting and the manifest-fingerprint hex
round-trip the resume audit depends on."""

from __future__ import annotations

from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

WORDS = ["aa", "bb", "cc", "dd", "ee"]


def _py_spans(docs: list[str], n: int) -> Counter:
    c: Counter = Counter()
    for text in docs:
        toks = text.split()
        for i in range(len(toks) - n + 1):
            c[" ".join(toks[i : i + n])] += 1
    return c


@pytest.mark.slow
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    docs=st.lists(
        st.lists(st.sampled_from(WORDS), min_size=0, max_size=12).map(" ".join),
        min_size=1,
        max_size=8,
    ),
    min_total=st.integers(min_value=1, max_value=3),
)
def test_duplicated_ngram_spans_matches_python(spark, docs, min_total):
    """For ANY small corpus over a tiny vocabulary (dense span
    collisions), the Spark span counts equal a pure-Python counter
    filtered at the same threshold."""
    from pysql2neo4j_spark.operators.dedup import duplicated_ngram_spans

    n = 3
    df = spark.createDataFrame(
        list(enumerate(docs)), "doc_id LONG, text STRING"
    )
    got = {
        r.span: r.n_total
        for r in duplicated_ngram_spans(df, "doc_id", "text", n=n, min_total=min_total).collect()
    }
    ref = {s: c for s, c in _py_spans(docs, n).items() if c >= min_total}
    assert got == ref


@pytest.mark.slow
@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    values=st.lists(
        st.integers(min_value=-(2**63), max_value=2**63 - 1),
        min_size=1,
        max_size=20,
    )
)
def test_hex_fingerprint_roundtrip(spark, values):
    """`F.hex(<long>)` -> `_hex_fp_to_long` must be the identity for
    any signed 64-bit value (incl. negatives / two's complement) — the
    resume-integrity audit XORs fingerprints through this parser."""
    from pysql2neo4j_spark.plans.checkpoint import _hex_fp_to_long

    df = spark.createDataFrame([(v,) for v in values], "v LONG")
    rows = df.select(
        "v", _hex_fp_to_long(F.hex(F.col("v"))).alias("back")
    ).collect()
    for r in rows:
        assert r.back == r.v, (r.v, r.back)


@given(
    keys=st.lists(st.integers(min_value=-(2**62), max_value=2**62), min_size=1, max_size=40),
    rate=st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
)
@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_hash_split_and_sample_match_md5_ground_truth(spark, keys, rate):
    """The split/sample rules' engine-portability claim, pinned to the
    md5 ground truth directly (hashlib — the definition both Spark and
    DuckDB implement): membership from the Spark Columns equals a
    pure-python evaluation of the same rule for arbitrary keys and
    rates, including the rate=0/1 edges."""
    import hashlib

    from pysql2neo4j_spark.functions.hashing import _rate_cut, hash_sample, hash_split

    cuts = {"train": "cccd", "val": "e666", "test": "zzzz"}

    def py_bucket(prefix, k):
        return hashlib.md5(f"{prefix}{k}".encode()).hexdigest()[:4]

    def py_split(k):
        b = py_bucket("", k)
        for name in ("train", "val"):
            if b < cuts[name]:
                return name
        return "test"

    df = spark.createDataFrame([(k,) for k in set(keys)], "k LONG")
    got = {
        r.k: (r.s, r.keep)
        for r in df.select(
            "k",
            hash_split(F.col("k"), cuts).alias("s"),
            hash_sample(F.col("k"), rate, seed=3).alias("keep"),
        ).collect()
    }
    for k in set(keys):
        assert got[k][0] == py_split(k)
        assert got[k][1] == (py_bucket("3:", k) < _rate_cut(rate))
