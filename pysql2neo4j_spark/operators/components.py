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
iterated to fixpoint. Converges in O(graph diameter) supersteps; alias
graphs have tiny diameter, and the superstep is a pure
join+groupBy+min, i.e. shuffle-parallel at any scale. Each superstep
``localCheckpoint(eager=True)`` truncates lineage so the plan does not
grow exponentially, and an aggregated change-count gives early exit —
the ONLY driver-controlled loop in the engine (SURVEY.md §4.3).
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
) -> DataFrame:
    """Return (id, component) where component = min id in the component.

    vertices: one column ``vertex_col`` (distinct ids).
    edges: undirected, given as (src, dst) pairs (any orientation).
    """
    sym = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .unionByName(edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst")))
        .dropDuplicates(["src", "dst"])
        .localCheckpoint(eager=True)
    )
    labels = vertices.select(F.col(vertex_col).alias("id")).withColumn("component", F.col("id"))
    labels = labels.localCheckpoint(eager=True)

    for _ in range(max_iter):
        nbr = (
            sym.join(labels, sym["src"] == labels["id"])
            .select(F.col("dst").alias("id"), F.col("component"))
        )
        new_labels = (
            labels.unionByName(nbr)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), on="id")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels


def canonical_entities(forms: DataFrame, form_edges: DataFrame) -> DataFrame:
    """Map every distinct norm to its canonical entity_id (= min norm of
    its similarity component). Singleton norms map to themselves."""
    comps = connected_components(
        forms.select("norm"),
        form_edges.select(F.col("norm_a").alias("src"), F.col("norm_b").alias("dst")),
        vertex_col="norm",
    )
    return comps.select(F.col("id").alias("norm"), F.col("component").alias("entity_id"))
