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
