"""B14/B15 — iterative hash-min connected components, DataFrame-only,
checkpointed per superstep [BASELINE.json:6].

Reference analogue: pysql2neo4j's "same PK => same node" uniqueness
[recon: graphproc.py createConstraints] — here node identity must be
*computed*: every connected component of the alias-similarity graph is
one canonical entity, labeled by the minimum vertex id (a string norm,
so min == lexicographic min — directly comparable to the frozen
reference's min-alias-norm representative).

Algorithm: label propagation to the neighborhood minimum —
  labels(v) <- min(labels(v), min over neighbors u of labels(u))
iterated to fixpoint; converges in O(graph diameter) supersteps, and
every superstep is a pure union+groupBy+min, i.e. shuffle-parallel at
any scale.

Engineering notes (this is the ONLY driver-controlled loop in the
engine — SURVEY.md §4.3):
  * ``localCheckpoint(eager=True)`` per superstep truncates lineage
    (else the plan doubles every iteration);
  * change detection is FUSED into the superstep aggregate (the old
    label rides along in the same groupBy), so the convergence check is
    a count over the just-checkpointed frame — no extra join, no
    recompute;
  * ``n_partitions`` sizes the superstep shuffles: label frames are
    usually dim-sized (distinct norms), so the default caps at 8 —
    pass more for genuinely huge vertex sets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    vertex_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 25,
    n_partitions: int | None = None,
) -> DataFrame:
    """Return (id, component) where component = min id in the component.

    vertices: one column ``vertex_col`` (distinct ids).
    edges: undirected, given as (src, dst) pairs (any orientation).
    """
    spark = vertices.sparkSession
    n_parts = n_partitions or min(spark.sparkContext.defaultParallelism, 4)

    sym = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .unionByName(edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst")))
        .dropDuplicates(["src", "dst"])
        .repartition(n_parts, "src")
        .localCheckpoint(eager=True)
    )
    labels = (
        vertices.select(F.col(vertex_col).alias("id"))
        .withColumn("component", F.col("id"))
        .repartition(n_parts, "id")
        .localCheckpoint(eager=True)
    )

    for _ in range(max_iter):
        nbr = sym.join(labels, sym["src"] == labels["id"]).select(
            F.col("dst").alias("id"),
            F.col("component"),
            F.lit(None).cast("string").alias("old"),
        )
        mine = labels.select("id", "component", F.col("component").alias("old"))
        new_labels = (
            mine.unionByName(nbr)
            .groupBy("id")
            .agg(
                F.min("component").alias("component"),
                # 'old' is non-null exactly once per id (its own row)
                F.max("old").alias("old"),
            )
            .withColumn("changed", F.col("component") != F.col("old"))
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter("changed").count()  # on checkpointed data
        labels = new_labels.select("id", "component")
        if changed == 0:
            break
    return labels


def canonical_entities(
    forms: DataFrame, form_edges: DataFrame, n_partitions: int | None = None
) -> DataFrame:
    """Map every distinct norm to its canonical entity_id (= min norm of
    its similarity component). Singleton norms map to themselves."""
    comps = connected_components(
        forms.select("norm"),
        form_edges.select(F.col("norm_a").alias("src"), F.col("norm_b").alias("dst")),
        vertex_col="norm",
        n_partitions=n_partitions,
    )
    return comps.select(F.col("id").alias("norm"), F.col("component").alias("entity_id"))
