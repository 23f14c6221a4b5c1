"""Scale-shape tests for graph materialization: a hot edge observed in
>=100k distinct conversations must aggregate with BOUNDED buffers
(provenance is capped before any collect — operators/graph.py) and
still produce the exact first-CAP sorted distinct conv_ids."""

from __future__ import annotations

from pyspark.sql import functions as F

from pysql2neo4j_spark.operators.graph import PROVENANCE_CAP, build_edges


def test_hot_edge_provenance_bounded(spark):
    n = 120_000
    t = spark.range(n).select(
        F.format_string("conv%06d", F.col("id")).alias("conv_id"),
        F.lit("ada lovelace").alias("subj_norm"),
        F.lit("analytical engine").alias("obj_norm"),
        F.lit("created").alias("pred"),
        F.format_string("m%d", F.col("id")).alias("subj_mention"),
        F.format_string("n%d", F.col("id")).alias("obj_mention"),
        F.lit("2024-01-01 00:00:00").cast("timestamp_ntz").alias("ts"),
    )
    f2e = spark.createDataFrame(
        [("ada lovelace", "ada lovelace"), ("analytical engine", "analytical engine")],
        ["norm", "entity_id"],
    )
    edges = build_edges(t, f2e, n_salts=4).collect()
    assert len(edges) == 1
    row = edges[0]
    assert row.n_obs == n
    assert row.first_ts is not None
    # exact first-CAP sorted distinct conv_ids, nothing more buffered
    assert row.provenance == [f"conv{i:06d}" for i in range(PROVENANCE_CAP)]


def test_multi_edge_provenance_exact(spark):
    """Cap logic must not disturb small edges: every distinct conv_id
    below the cap appears, sorted."""
    rows = [
        (f"c{j}", "a", "b", "knows", f"sm{i}{j}", f"om{i}{j}")
        for i in range(3)
        for j in range(5)
    ]
    t = spark.createDataFrame(
        rows, ["conv_id", "subj_norm", "obj_norm", "pred", "subj_mention", "obj_mention"]
    ).withColumn("ts", F.lit("2024-01-01 00:00:00").cast("timestamp_ntz"))
    f2e = spark.createDataFrame([("a", "a"), ("b", "b")], ["norm", "entity_id"])
    row = build_edges(t, f2e, n_salts=2).collect()[0]
    assert row.n_obs == 15
    assert row.provenance == [f"c{j}" for j in range(5)]
