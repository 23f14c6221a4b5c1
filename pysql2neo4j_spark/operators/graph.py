"""B15-B17 — canonical-id assignment + node/edge materialization.

Reference semantics preserved [recon: graphproc.py]:
  * PK -> node identity        => canonical entity_id -> one node row
    (uniqueness enforced by groupBy on entity_id — the Spark analogue of
    ``CREATE CONSTRAINT ... IS UNIQUE``, audited in pipeline metrics);
  * FK -> relationship          => each (subj, pred, obj) triple instance
    joins both endpoints to canonical ids and aggregates to one edge row
    with properties (n_obs, first_ts, provenance) — the association-
    table-with-properties case [recon: rdbmsproc.py is_association].

Scale notes: the two mention->entity joins are salted broadcast joins
(the form->entity map is dim-sized; the hot entity is ~30% of mentions),
so the fact table is never shuffled for linking — only for the final
groupBys, which AQE splits if skewed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .skew import salted_broadcast_join

PROVENANCE_CAP = 20


def link_mentions(mentions: DataFrame, form2entity: DataFrame, n_salts: int = 16) -> DataFrame:
    """Attach entity_id to every mention via salted broadcast join."""
    return salted_broadcast_join(
        mentions, form2entity, key="norm", salt_on="mention_id", n_salts=n_salts
    )


def build_nodes(
    linked_mentions: DataFrame, cache_registry: list | None = None
) -> DataFrame:
    """One node per canonical entity: id, display name (most frequent
    surface, deterministic tiebreak), alias set, mention count.

    ONE pass over the fact table: the (entity, surface, norm) rollup is
    vocabulary-sized, so it is lazily persist()ed and both the
    display-name window and the alias/count aggregate read the cached
    rollup instead of re-running the fact scan + salted join twice
    (measured ~2x on the 8M-turn bench). persist, not localCheckpoint:
    a lazy localCheckpoint converts the plan to an RDD at DEFINITION
    time — seconds of driver-side planning plus a broadcast job, i.e.
    fixed cost the N->4N scaling target pays for (BENCH/BASELINE.md);
    persist is free until the action. Callers pass ``cache_registry``
    to unpersist after materializing (plans/pipeline.py does)."""
    per_surface = (
        linked_mentions.groupBy("entity_id", "surface", "norm")
        .agg(F.count("*").alias("n"))
        .persist()
    )
    if cache_registry is not None:
        cache_registry.append(per_surface)
    w = Window.partitionBy("entity_id").orderBy(F.desc("n"), "surface")
    best = per_surface.withColumn("rn", F.row_number().over(w)).filter("rn = 1").select(
        "entity_id", F.col("surface").alias("canonical_name")
    )
    agg = per_surface.groupBy("entity_id").agg(
        F.sort_array(F.collect_set("norm")).alias("aliases"),
        F.sum("n").alias("n_mentions"),
    )
    return (
        agg.join(best, on="entity_id")
        .select(
            "entity_id",
            F.lit("entity").alias("label"),
            "canonical_name",
            "aliases",
            "n_mentions",
        )
    )


def build_edges(
    triples: DataFrame,
    form2entity: DataFrame,
    n_salts: int = 16,
    cache_registry: list | None = None,
) -> DataFrame:
    """Canonical edges with properties + provenance.

    Two salted broadcast joins (subj, obj) then a distinct-ifying
    aggregate — the Spark analogue of the reference's per-FK MATCH ...
    CREATE, collapsed to set semantics with observation counts."""
    subj_map = form2entity.select(
        F.col("norm").alias("subj_norm"), F.col("entity_id").alias("src_entity")
    )
    obj_map = form2entity.select(
        F.col("norm").alias("obj_norm"), F.col("entity_id").alias("dst_entity")
    )
    t = salted_broadcast_join(triples, subj_map, key="subj_norm", salt_on="subj_mention", n_salts=n_salts)
    t = salted_broadcast_join(t, obj_map, key="obj_norm", salt_on="obj_mention", n_salts=n_salts)
    # ONE pass over the fact, bounded buffers throughout. Provenance =
    # first PROVENANCE_CAP distinct conv_ids in sorted order; a naive
    # slice(sort_array(collect_set(conv_id)), 1, cap) would buffer EVERY
    # distinct conv_id of a hot edge in one aggregation state (the hot
    # entity is ~30% of mentions — millions of strings per buffer at
    # 10^12 turns). Instead:
    #   1. per-(edge, conv_id) rollup: hash agg with map-side combine,
    #      per-group state = one counter + one timestamp. Lazily
    #      persist()ed (MEMORY_AND_DISK — free at definition, see
    #      build_nodes): later actions read the cached rollup; within
    #      the first action the two branch stages may race-compute it
    #      concurrently (cache-race semantics) — that duplicate work is
    #      map-side, embarrassingly parallel, and bounded, unlike a
    #      localCheckpoint whose definition costs seconds of driver
    #      planning (fixed cost the N->4N scaling target pays 4x for);
    #   2. base: plain hash agg over the rollup (bounded state);
    #   3. provenance: row_number window (streaming after sort — no
    #      full-partition buffering; the sort spills) -> keep rank <=
    #      CAP -> collect_list never sees more than CAP rows.
    keys = ["src_entity", "dst_entity", "pred"]
    per_conv = (
        t.groupBy(*keys, "conv_id")
        .agg(F.count("*").alias("cnt"), F.min("ts").alias("mts"))
        .persist()
    )
    if cache_registry is not None:
        cache_registry.append(per_conv)
    base = per_conv.groupBy(*keys).agg(
        F.sum("cnt").alias("n_obs"), F.min("mts").alias("first_ts")
    )
    w_rank = Window.partitionBy(*keys).orderBy("conv_id")
    prov = (
        per_conv.select(*keys, "conv_id")
        .withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") <= PROVENANCE_CAP)
        .groupBy(*keys)
        .agg(F.sort_array(F.collect_list("conv_id")).alias("provenance"))
    )
    # both sides aggregate on the same keys (co-partitioned join)
    return base.join(prov, on=keys, how="left").select(
        *keys, "n_obs", "first_ts", "provenance"
    )
