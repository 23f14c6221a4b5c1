"""Dedup family: all four text detectors agree on the fixtures' planted
near-dup pairs; embedding dedup finds planted vector dups."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pysql2neo4j_spark.operators.dedup import (
    embedding_dup_pairs,
    exact_dup_groups,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def truth_pairs(docs):
    """Ground truth: exact word-3gram Jaccard >= 0.8, brute force in
    python over the 500 fixture docs."""
    import itertools

    rows = docs.select("doc_id", "text").collect()

    def sh(t):
        w = t.split()
        return {" ".join(w[i : i + 3]) for i in range(max(len(w) - 2, 1))}

    shs = {r.doc_id: sh(r.text) for r in rows}
    out = set()
    for a, b in itertools.combinations(sorted(shs), 2):
        A, B = shs[a], shs[b]
        inter = len(A & B)
        if inter / (len(A) + len(B) - inter) >= 0.8:
            out.add((a, b))
    return out


def test_ngram_jaccard_exact(docs, truth_pairs):
    got = {(r.id_a, r.id_b) for r in ngram_jaccard_pairs(docs, "doc_id", "text").collect()}
    assert got == truth_pairs and len(truth_pairs) > 0


def test_minhash_lsh_perfect_recall_here(docs, truth_pairs):
    got = {(r.id_a, r.id_b) for r in minhash_lsh_pairs(docs, "doc_id", "text").collect()}
    assert got == truth_pairs


def test_simhash_with_verification(docs, truth_pairs):
    got = {
        (r.id_a, r.id_b)
        for r in simhash_pairs(docs, "doc_id", "text", max_hamming=64, verify_threshold=0.8).collect()
    }
    assert got == truth_pairs


def test_exact_dup_groups_planted(spark, docs):
    aug = docs.select("doc_id", "text").unionByName(
        docs.filter(F.col("doc_id") % 50 == 0).select(
            (F.col("doc_id") + 10000).alias("doc_id"), "text"
        )
    )
    groups = exact_dup_groups(aug, "doc_id", "text").collect()
    assert len(groups) == docs.filter(F.col("doc_id") % 50 == 0).count()
    for g in groups:
        assert g.n_copies == 2 and g.keeper_id == min(g.member_ids)


def test_embedding_dup_pairs_planted(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    planted = emb.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 90000).alias("vec_id"), "embedding", "label"
    )
    aug = emb.unionByName(planted)
    pairs = embedding_dup_pairs(aug, "vec_id", "embedding", threshold=0.999).collect()
    got = {(r.id_a, r.id_b) for r in pairs}
    assert got == {(i, i + 90000) for i in range(5)}


def test_spread_skips_shuffle_on_parallel_scan(spark, tmp_out):
    """VERDICT r2 #4: _spread must NOT repartition (an extra full-text
    Exchange at 100 TB) when the scan is already parallel; it only
    rescues few-task scans (single-row-group files)."""
    import os

    from pysql2neo4j_spark.operators.dedup import _spread

    par = spark.sparkContext.defaultParallelism
    df = spark.range(10000).withColumn("text", F.concat(F.lit("doc "), F.col("id")))

    wide = os.path.join(tmp_out, "wide.parquet")
    df.repartition(par).write.parquet(wide)
    scan = spark.read.parquet(wide)
    assert scan.rdd.getNumPartitions() >= par // 2
    spread = _spread(scan)
    assert spread is scan  # pass-through: no added Exchange
    assert "Exchange" not in spread._jdf.queryExecution().executedPlan().toString()

    narrow = os.path.join(tmp_out, "narrow.parquet")
    df.coalesce(1).write.parquet(narrow)
    nscan = spark.read.parquet(narrow)
    assert nscan.rdd.getNumPartitions() < max(2, par // 2)
    assert _spread(nscan).rdd.getNumPartitions() == par


def test_spread_definition_runs_no_jobs(spark, tmp_path):
    """VERDICT r3 #9: building a dedup plan must not run Spark jobs at
    DataFrame-definition time (the old probe forced a DataFrame->RDD
    conversion per call). The partition probe is inputFiles() + local
    file sizes — pure driver-side metadata."""
    import os

    from pysql2neo4j_spark.operators.dedup import exact_dup_groups

    path = os.path.join(str(tmp_path), "docs")
    spark.range(100).selectExpr(
        "id", "repeat('x', cast(id % 7 as int)) as text"
    ).coalesce(1).write.parquet(path)
    df = spark.read.parquet(path)

    sc = spark.sparkContext
    sc.setJobGroup("spread_probe", "definition-time probe")
    try:
        plan = exact_dup_groups(df, "id", "text")  # definition only
        jobs = sc._jsc.sc().statusTracker().getJobIdsForGroup("spread_probe")
        assert len(jobs) == 0, f"plan definition ran {len(jobs)} Spark job(s)"
    finally:
        sc.setJobGroup("", "")
    # the plan still executes correctly afterwards
    assert plan.count() >= 0
