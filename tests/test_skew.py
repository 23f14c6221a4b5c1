"""Salted broadcast join (B11): result identity + skew reshaping."""

from __future__ import annotations

from pyspark.sql import functions as F

from pysql2neo4j_spark.operators.skew import salted_broadcast_join


def _fact_dim(spark):
    # hot key 'h' carries 60% of the fact rows
    rows = [("h" if i % 5 < 3 else f"k{i % 50}", f"row{i}") for i in range(5000)]
    fact = spark.createDataFrame(rows, ["key", "payload"])
    dim = spark.createDataFrame([("h", "HOT")] + [(f"k{i}", f"D{i}") for i in range(50)], ["key", "attr"])
    return fact, dim


def test_salted_equals_unsalted(spark):
    fact, dim = _fact_dim(spark)
    plain = fact.join(dim, "key").select("key", "payload", "attr")
    salted = salted_broadcast_join(fact, dim, key="key", salt_on="payload", n_salts=8).select(
        "key", "payload", "attr"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salt_spreads_hot_key(spark):
    fact, _ = _fact_dim(spark)
    spread = (
        fact.filter(F.col("key") == "h")
        .withColumn("salt", F.pmod(F.xxhash64("payload"), F.lit(8)).cast("int"))
        .groupBy("salt")
        .count()
        .collect()
    )
    counts = {r.salt: r["count"] for r in spread}
    assert len(counts) == 8  # hot key split across all salt buckets
    assert max(counts.values()) < 2.0 * min(counts.values())


def test_salted_join_stays_broadcast(spark):
    fact, dim = _fact_dim(spark)
    plan = salted_broadcast_join(fact, dim, key="key", salt_on="payload", n_salts=4)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_deterministic_across_retries(spark):
    fact, dim = _fact_dim(spark)
    a = salted_broadcast_join(fact, dim, key="key", salt_on="payload").collect()
    b = salted_broadcast_join(fact.repartition(13), dim, key="key", salt_on="payload").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))
