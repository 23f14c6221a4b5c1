"""As-of join semantics: inclusive (<=) match, per-key isolation, LEFT
nulls when no prior right row exists."""

from __future__ import annotations

from pysql2neo4j_spark.operators.temporal import asof_join


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, 10, "a"), (2, 20, "a"), (3, 5, "b"), (4, 30, "b")],
        "id LONG, ts LONG, k STRING",
    )
    right = spark.createDataFrame(
        [(10, "a", 1.0), (15, "a", 2.0), (20, "a", 3.0), (25, "b", 9.0)],
        "ts LONG, k STRING, v DOUBLE",
    )
    got = {
        r.id: (r.asof_ts, r.v)
        for r in asof_join(left, right, by="k", left_ts="ts", right_ts="ts").collect()
    }
    assert got[1] == (10, 1.0)      # inclusive: right at SAME ts matches
    assert got[2] == (20, 3.0)      # latest of several priors
    assert got[3] == (None, None)   # no prior right row -> LEFT nulls
    assert got[4] == (25, 9.0)      # keys isolated ('a' rows never leak)


def test_asof_join_keeps_all_left_rows(spark):
    left = spark.range(100).selectExpr("id", "id AS ts", "CAST(id % 7 AS STRING) AS k")
    right = spark.createDataFrame([(50, "0", 1.0)], "ts LONG, k STRING, v DOUBLE")
    out = asof_join(left, right, by="k", left_ts="ts", right_ts="ts")
    assert out.count() == 100
    matched = out.filter("v IS NOT NULL")
    assert matched.count() == len([i for i in range(100) if i % 7 == 0 and i >= 50])


def test_asof_join_matches_pandas_merge_asof(spark):
    """Property-style: on seeded random data the operator must agree
    with pandas.merge_asof(direction='backward') — an independent
    implementation of the same semantics."""
    import pandas as pd
    import numpy as np

    rng = np.random.default_rng(11)
    left_pdf = pd.DataFrame(
        {
            "id": np.arange(400),
            "ts": rng.integers(0, 1000, 400),
            "k": [f"k{int(x)}" for x in rng.integers(0, 6, 400)],
        }
    )
    right_pdf = (
        pd.DataFrame(
            {
                "ts": rng.integers(0, 1000, 150),
                "k": [f"k{int(x)}" for x in rng.integers(0, 6, 150)],
                "v": np.round(rng.normal(size=150), 6),
            }
        )
        .drop_duplicates(subset=["k", "ts"])  # operator requires unique (key, ts)
        .reset_index(drop=True)
    )

    got = (
        asof_join(
            spark.createDataFrame(left_pdf, "id LONG, ts LONG, k STRING"),
            spark.createDataFrame(right_pdf, "ts LONG, k STRING, v DOUBLE"),
            by="k",
        )
        .select("id", "asof_ts", "v")
        .toPandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    want = pd.merge_asof(
        left_pdf.sort_values("ts", kind="stable"),
        right_pdf.sort_values("ts", kind="stable"),
        on="ts",
        by="k",
        direction="backward",
    ).sort_values("id").reset_index(drop=True)

    # merge_asof does not expose the matched right-side ts, so the
    # value column (NaN-safe) is the comparable surface
    import numpy.testing as npt

    npt.assert_array_equal(
        got["v"].fillna(-9e9).to_numpy(), want["v"].fillna(-9e9).to_numpy()
    )
    # unmatched rows must agree too: asof_ts null exactly where v is
    assert (got["asof_ts"].isna() == got["v"].isna()).all()


def test_asof_join_rejects_colliding_value_columns(spark):
    """ADVICE r2: a right value column sharing a name with a left column
    would emit duplicate/ambiguous output columns — refuse loudly."""
    import pytest

    from pysql2neo4j_spark.operators.temporal import asof_join

    left = spark.createDataFrame([(1, 10, 5)], "k int, ts int, v int")
    right = spark.createDataFrame([(1, 9, 7)], "k int, ts int, v int")
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, by="k")

    left2 = left.withColumnRenamed("v", "asof_ts")
    right2 = right.withColumnRenamed("v", "rv")
    with pytest.raises(ValueError, match="asof_ts"):
        asof_join(left2, right2, by="k")


def test_asof_join_bucketed_equals_window_impl(spark):
    """Property test (VERDICT r2 #7): the ts-bucketed variant must equal
    the single-window implementation on randomized data including one
    ~30%-hot key, across bucket widths (incl. widths smaller than the
    data's time span, so carry-over crosses many buckets)."""
    import random

    from pysql2neo4j_spark.operators.temporal import asof_join, asof_join_bucketed

    rng = random.Random(11)
    keys = [f"u{i}" for i in range(12)]

    def pick():  # ~30% of rows on the hot key
        return "hot" if rng.random() < 0.3 else rng.choice(keys)

    left_rows = [(i, pick(), rng.randrange(0, 100_000)) for i in range(800)]
    right_rows = {(pick(), rng.randrange(0, 100_000)) for _ in range(400)}
    left = spark.createDataFrame(left_rows, "id long, k string, ts long")
    right = spark.createDataFrame(
        [(k, t, float(t % 97)) for (k, t) in right_rows], "k string, ts long, v double"
    )

    want = sorted(
        map(tuple, asof_join(left, right, by="k").select("id", "asof_ts", "v").collect())
    )
    for width in (1000, 7919, 100_000, 10_000_000):
        got = sorted(
            map(
                tuple,
                asof_join_bucketed(left, right, by="k", bucket_seconds=width)
                .select("id", "asof_ts", "v")
                .collect(),
            )
        )
        assert got == want, f"bucket width {width} diverges"
