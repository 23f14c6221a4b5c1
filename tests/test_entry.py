"""Driver-contract smoke: entry() and a representative query subset at
sf0.001 (the full oracle comparison runs via tools/selfcheck.py and the
driver's own gate at sf0.01)."""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
import __spark_entry__ as entry_mod  # noqa: E402

SF = "/root/testdata/sf0.001"

SMOKE_KEYS = [
    "scan_project",
    "join_broadcast",
    "agg_hash",
    "window_rank",
    "kg_edges_assoc_lineitem",
    "dedup_minhash_lsh",
    "ann_topk_exact",
    "text_lang_id",
    "multimodal_features",
    "cc_hashmin_components",
    "stream_tumbling",
]


def test_entry_flagship(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) == 10
    assert rows[0].rnk == 1 and rows[0].n_edges >= rows[-1].n_edges


def test_registry_consistency():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert len(q) >= 40
    assert set(o) <= set(q)
    # rows-only keys are deliberate, enumerated exceptions
    assert set(q) - set(o) == {"agg_approx"}


@pytest.mark.parametrize("key", SMOKE_KEYS)
def test_query_smoke(spark, key):
    df = entry_mod.queries()[key](spark, SF)
    assert df.count() >= 0  # executes without error; schema resolvable
    assert df.columns


def test_hash_split_deterministic_and_balanced(spark):
    """Split assignment is a pure function of the key (stable across
    repartitionings) and lands near the 80/10/10 design ratios.
    Two-char cut points (the r5 API) must keep their exact fractions
    under the four-char bucket (string comparison: 'cdxx' < 'cd' is
    false, so the boundary is unchanged)."""
    from pysql2neo4j_spark.functions.hashing import hash_split
    from pyspark.sql import functions as F

    df = spark.range(20000).select(F.col("id").alias("k"))
    cuts = {"train": "cd", "val": "e6", "test": "zz"}
    a = df.select("k", hash_split(F.col("k"), cuts).alias("s"))
    b = df.repartition(17, "k").select("k", hash_split(F.col("k"), cuts).alias("s"))
    assert a.exceptAll(b).isEmpty() and b.exceptAll(a).isEmpty()
    frac = {r.s: r.n / 20000 for r in a.groupBy("s").agg(F.count("*").alias("n")).collect()}
    assert abs(frac["train"] - 205 / 256) < 0.02
    assert abs(frac["val"] - 25 / 256) < 0.01
    assert abs(frac["test"] - 26 / 256) < 0.01


def test_hash_split_subpercent_granularity(spark):
    """Four-hex-char buckets (VERDICT r5 #5) express sub-percent
    slices: a 0.87% holdout band ('e666'..'e8a3') lands within
    sampling noise of 573/65536, which the 1/256 two-char form could
    never carve (its minimum slice is ~0.39% and only at byte
    boundaries)."""
    from pysql2neo4j_spark.functions.hashing import hash_split
    from pyspark.sql import functions as F

    n = 200_000
    df = spark.range(n).select(F.col("id").alias("k"))
    cuts = {"train": "cccd", "val": "e666", "holdout": "e8a3", "test": "zzzz"}
    got = {
        r.s: r.n
        for r in df.select(hash_split(F.col("k"), cuts).alias("s"))
        .groupBy("s")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    expect = 573 / 65536  # 0.87%
    assert abs(got["holdout"] / n - expect) < 0.002
    assert abs(got["train"] / n - 0xCCCD / 65536) < 0.01


def test_stratified_sample_deterministic_rates(spark):
    """Per-stratum keep-rates land within sampling noise, membership is
    a pure function of (seed, key, stratum) — stable across
    repartitionings — and a different seed draws a (near-)independent
    sample; invalid rates raise."""
    import pytest
    from pysql2neo4j_spark.functions.hashing import stratified_sample_pred
    from pyspark.sql import functions as F

    n = 60_000
    df = spark.range(n).select(
        F.col("id").alias("k"),
        F.element_at(
            F.array(F.lit("en"), F.lit("es"), F.lit("zh")),
            (F.pmod(F.col("id"), F.lit(3)) + 1).cast("int"),
        ).alias("lang"),
    )
    rates = {"en": 1.0, "es": 0.25, "zh": 0.0625}
    pred = stratified_sample_pred(F.col("k"), F.col("lang"), rates, seed=7)
    kept = df.filter(pred)
    got = {r.lang: r.n for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    per = n / 3
    assert got["en"] == per  # rate 1.0 keeps every row
    assert abs(got["es"] / per - 0.25) < 0.02
    assert abs(got["zh"] / per - 0.0625) < 0.01

    shuffled = df.repartition(13, "k").filter(pred)
    assert kept.exceptAll(shuffled).isEmpty() and shuffled.exceptAll(kept).isEmpty()

    other = df.filter(stratified_sample_pred(F.col("k"), F.col("lang"), rates, seed=8))
    es_a = {r.k for r in kept.filter("lang = 'es'").collect()}
    es_b = {r.k for r in other.filter("lang = 'es'").collect()}
    overlap = len(es_a & es_b) / max(len(es_a), 1)
    assert abs(overlap - 0.25) < 0.05  # independent draws: P(both) ~ rate^2 / rate

    with pytest.raises(ValueError, match="rate"):
        stratified_sample_pred(F.col("k"), F.col("lang"), {"en": 1.5})

    # hash_sample (the single-rate form) shares the seeded bucket: a
    # flat 25% draw equals the stratified predicate with one uniform
    # rate, and its rate lands within sampling noise
    from pysql2neo4j_spark.functions.hashing import hash_sample

    flat = df.filter(hash_sample(F.col("k"), 0.25, seed=7))
    uni = df.filter(
        stratified_sample_pred(F.col("k"), F.col("lang"), {}, seed=7, default_rate=0.25)
    )
    assert flat.exceptAll(uni).isEmpty() and uni.exceptAll(flat).isEmpty()
    assert abs(flat.count() / n - 0.25) < 0.01
    with pytest.raises(ValueError, match="rate"):
        hash_sample(F.col("k"), -0.1)


def test_hash_split_rejects_unordered_cuts(spark):
    """ADVICE r5: out-of-order cut points would make later splits
    silently unreachable under the first-match-wins when-chain —
    that must raise, not mislabel."""
    import pytest
    from pysql2neo4j_spark.functions.hashing import hash_split
    from pyspark.sql import functions as F

    with pytest.raises(ValueError, match="ascending"):
        hash_split(F.col("k"), {"val": "e6", "train": "cd", "test": "zz"})
    with pytest.raises(ValueError, match="ascending"):
        hash_split(F.col("k"), {"a": "80", "b": "80", "rest": "zz"})
    with pytest.raises(ValueError, match="at least one"):
        hash_split(F.col("k"), {})
