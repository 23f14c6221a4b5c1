"""B2/B3 — stable turn ordering + explicit conv-hash repartitioning.

Reference analogue: pysql2neo4j pages each table with ``ORDER BY pk LIMIT
.. OFFSET ..`` [recon: rdbmsproc.py]; the Spark-native equivalent is a
window over (conv_id, turn_idx) that assigns a stable ordinal, plus an
explicit hash repartition on conv_id so every downstream per-
conversation operation is co-located and skew-free [BASELINE.json:6].
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def repartition_by_conv(df: DataFrame, n_partitions: int | None = None) -> DataFrame:
    """Explicit repartition on conv_id hash [BASELINE.json:6]. Hashing
    via xxhash64 spreads adversarial conv_id distributions uniformly."""
    n = n_partitions or df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, F.xxhash64("conv_id"))


def with_stable_order(df: DataFrame) -> DataFrame:
    """Attach ``turn_ord`` = row_number over (conv_id, turn_idx, ts).

    (conv_id, turn_idx) is unique by contract; ts breaks ties defensively
    if an upstream producer violates it. This is the anchor of the
    per-turn text-equality invariant [BASELINE.json:15]: any shuffle /
    input order yields identical (conv_id, turn_ord, text) rows —
    asserted in tests/test_invariants.py.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx", "ts")
    return df.withColumn("turn_ord", F.row_number().over(w))
