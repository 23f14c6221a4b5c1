"""B14/B15 — iterative hash-min connected components with pointer-jump
path compression, DataFrame-only, checkpointed per superstep
[BASELINE.json:6].

Reference analogue: pysql2neo4j's "same PK => same node" uniqueness
[recon: graphproc.py createConstraints] — here node identity must be
*computed*: every connected component of the alias-similarity graph is
one canonical entity, labeled by the minimum vertex id (a string norm,
so min == lexicographic min — directly comparable to the frozen
reference's min-alias-norm representative).

Algorithm (hash-min + path halving, the DataFrame form of the
large-star/small-star shortcutting idea):
  propagate:  labels(v) <- min(labels(v), min over neighbors u of labels(u))
  compress:   labels(v) <- min(labels(v), prev_labels(labels(v)))
iterated to fixpoint. Propagation alone needs O(graph diameter)
supersteps; the compression join halves the remaining pointer distance
each round, so convergence is O(log diameter) — a 300-hop alias chain
closes in ~10 supersteps instead of 300 (tests/test_components.py).
Labels only decrease and stay within the component (every label is a
vertex id first seen via a path), so the fixpoint is the component
minimum, exactly as plain hash-min.

Engineering notes (this is the ONLY driver-controlled loop in the
engine — SURVEY.md §4.3):
  * ``localCheckpoint(eager=True)`` per superstep truncates lineage
    (else the plan doubles every iteration);
  * the convergence check is FUSED into the checkpoint job via
    ``Observation`` (CollectMetrics in the same plan): ONE Spark job
    per superstep, no separate count — this is driver fixed cost F in
    the N->4N scaling decomposition (BENCH/BASELINE.md), so job count
    matters more than per-job work here;
  * the compression join's right side is the PREVIOUS superstep's
    labels — already checkpointed, so the join adds no recompute;
  * non-convergence RAISES (``ConvergenceError``) instead of silently
    returning split components — wrong canonical ids must never be
    produced quietly;
  * ``n_partitions`` sizes the superstep shuffles; the default scales
    with the input frame (capped by the session parallelism). Callers
    with known-small label frames (the pipeline's vocabulary-sized
    distinct-norm graph) should pass a small explicit value so the
    per-superstep fixed cost stays low.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


class ConvergenceError(RuntimeError):
    """Raised when the superstep loop exhausts max_iter with labels
    still changing — the labels would be WRONG (split components)."""


def _release_local_checkpoint(df: DataFrame) -> None:
    """Drop a ``localCheckpoint(eager=True)`` frame's cached blocks NOW
    instead of waiting for driver GC + ContextCleaner. The frame is
    UNUSABLE afterwards — a local checkpoint is non-reliable, its
    lineage is truncated, so dropped blocks can never be recomputed —
    call only when no plan will read it again. Best-effort: the py4j
    path to the LogicalRDD's backing RDD is internal API, so failure
    degrades to the old keep-until-GC behavior rather than erroring."""
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:  # noqa: BLE001 — internal accessor, version-specific
        pass


def _driver_union_find(
    spark, vertices: DataFrame, vertex_col: str, rows
) -> DataFrame:
    """Small-graph CC: path-compressed union-find over ``rows``, the
    BOUNDED edge collect the route probe already fetched (the caller
    gates on ``small_graph_threshold`` — edges cross to the driver
    exactly once). Only edge-INCIDENT vertices appear in ``rows`` —
    the vertex frame itself is never pulled to the driver, so a huge
    vocabulary with few similarity edges stays distributed: singletons
    resolve to themselves in the attach step below."""
    from pyspark.sql import types as T

    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for r in rows:
        ra, rb = find(r.src), find(r.dst)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)  # min id wins the root
    members: dict = {}
    for x in set(parent) | {r.src for r in rows} | {r.dst for r in rows}:
        members.setdefault(find(x), []).append(x)
    label = []
    for root, xs in members.items():
        m = min(xs + [root])
        label.extend((x, m) for x in xs)

    vt = vertices.schema[vertex_col].dataType
    # Attach components to the (possibly huge, never collected) vertex
    # frame. Two shapes by mapping size:
    #   * small (alias-cluster vocabularies — the pipeline case): a
    #     literal MAP lookup — a NARROW projection, no BroadcastExchange
    #     job, no join stage; with checkpointed vertices the whole tail
    #     is one short job (the cc stage is pure fixed cost at N->4N);
    #   * large: broadcast left join as before (a literal expression
    #     tree with 100k+ entries would choke the driver/codegen).
    ids = vertices.select(F.col(vertex_col).alias("id"))
    if len(label) <= 4096:
        if label:
            m = F.create_map(*[F.lit(x) for kv in label for x in kv])
            comp = F.coalesce(m[F.col("id")], F.col("id"))
        else:
            comp = F.col("id")
        out = ids.select("id", comp.alias("component"))
    else:
        mapping = spark.createDataFrame(
            label,
            T.StructType([T.StructField("id", vt), T.StructField("component", vt)]),
        )
        out = (
            ids.join(F.broadcast(mapping), "id", "left")
            .select("id", F.coalesce("component", "id").alias("component"))
        )
    # checkpoint like the superstep loop's labels: downstream consumers
    # (three broadcast joins in the pipeline) must re-read a
    # materialized vocabulary-sized frame, not re-run the vertices
    # aggregation (a fact-sized scan) once per consumer
    return out.localCheckpoint(eager=True)


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    vertex_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 25,
    n_partitions: int | None = None,
    small_graph_threshold: int = 100_000,
) -> DataFrame:
    """Return (id, component) where component = min id in the component.

    vertices: one column ``vertex_col`` (distinct ids).
    edges: undirected, given as (src, dst) pairs (any orientation).
    Raises ConvergenceError if not converged within ``max_iter``.

    Small-graph fast path: ONE bounded job materializes the DIRECTED
    edge list and decides the route. If the collect stays under
    ``small_graph_threshold`` (the same boundedness contract as
    driver-side IVF centroid training), a driver union-find replaces
    the superstep loop — union-find is orientation-agnostic, so the
    symmetrization (union + dropDuplicates + repartition, three extra
    shuffle stages of pure fixed cost on a vocabulary-sized graph —
    the cc stage of the N->4N decomposition in BENCH/BASELINE.md) is
    built ONLY on the distributed route, where the superstep loop
    needs it. The distributed loop itself is untouched; pass
    ``small_graph_threshold=0`` to force it (the equivalence pytest
    does). Note the threshold gates the DIRECTED edge count here
    (~half the symmetric count the r2-r4 gate measured) — strictly
    more conservative for driver memory."""
    spark = vertices.sparkSession
    if n_partitions is None:
        # session-parallelism default: touching vertices.rdd here would
        # force a DataFrame->RDD plan conversion (driver-side analysis +
        # potential broadcast jobs) on every call that omits the arg
        # (ADVICE r2). Callers with better knowledge size it explicitly
        # — the pipeline passes cfg.cc_partitions (vocabulary-sized).
        n_partitions = max(4, spark.sparkContext.defaultParallelism)
    n_parts = n_partitions

    directed = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    if small_graph_threshold:
        # the upstream edge plan (candidate self-join + scoring in the
        # pipeline) is materialized EXACTLY ONCE, into this checkpoint;
        # the probe then reads cached blocks, and the over-threshold
        # route builds sym from the same cache instead of re-running
        # the plan (a limit().collect() probe on the live plan would
        # evaluate the whole map side of its shuffles, then sym would
        # pay the full plan AGAIN on precisely the expensive route)
        directed = directed.localCheckpoint(eager=True)
        probe = directed.limit(small_graph_threshold + 1).collect()
        if len(probe) <= small_graph_threshold:
            out = _driver_union_find(spark, vertices, vertex_col, rows=probe)
            # the probe rows are on the driver and the result is its own
            # checkpoint — directed's blocks have no further reader
            _release_local_checkpoint(directed)
            return out
    sym = (
        directed
        .unionByName(directed.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .dropDuplicates(["src", "dst"])
        .repartition(n_parts, "src")
        .localCheckpoint(eager=True)
    )
    if small_graph_threshold:
        # ADVICE r5: on precisely the large-edge-list route the probe's
        # directed checkpoint and sym would otherwise BOTH stay
        # materialized for the query lifetime. sym's eager checkpoint
        # has read everything it needs from directed's blocks, and no
        # plan below references directed — release its storage now.
        _release_local_checkpoint(directed)

    # superstep-0 seed: component = least(id, min neighbor) instead of
    # identity (VERDICT r2 #6) — one cheap aggregate on the symmetric
    # edge list saves a full propagate+jump+checkpoint superstep for
    # every star/shallow component (the common case for alias clusters),
    # which is pure fixed cost on a vocabulary-sized graph.
    nbr_min = sym.groupBy("src").agg(F.min("dst").alias("__mn"))
    labels = (
        vertices.select(F.col(vertex_col).alias("id"))
        .join(nbr_min, F.col("id") == F.col("src"), "left")
        .select(
            "id",
            F.least(F.col("id"), F.coalesce(F.col("__mn"), F.col("id"))).alias("component"),
        )
        .repartition(n_parts, "id")
        .localCheckpoint(eager=True)
    )

    changed = 0
    for _ in range(max_iter):
        # -- propagate: min label over self + neighborhood
        nbr = sym.join(labels, sym["src"] == labels["id"]).select(
            F.col("dst").alias("id"),
            F.col("component"),
            F.lit(None).cast("string").alias("old"),
        )
        mine = labels.select("id", "component", F.col("component").alias("old"))
        prop = (
            mine.unionByName(nbr)
            .groupBy("id")
            .agg(
                F.min("component").alias("component"),
                # 'old' is non-null exactly once per id (its own row)
                F.max("old").alias("old"),
            )
        )
        # -- compress: jump through the previous labels (checkpointed,
        # so this join re-reads cached blocks, not the plan above).
        # Every label is a vertex id, so the lookup always resolves;
        # left+coalesce guards the invariant instead of silently
        # dropping rows if it were ever violated.
        jump = labels.select(F.col("id").alias("j_id"), F.col("component").alias("j_comp"))
        new_plan = (
            prop.join(jump, prop["component"] == jump["j_id"], "left")
            .select(
                prop["id"],
                F.least(
                    prop["component"], F.coalesce(F.col("j_comp"), prop["component"])
                ).alias("component"),
                prop["old"],
            )
        )
        obs = Observation()
        observed = new_plan.withColumn(
            "changed", F.col("component") != F.col("old")
        ).observe(obs, F.sum(F.col("changed").cast("long")).alias("n_changed"))
        labels = (
            observed.select("id", "component")
            .repartition(n_parts, "id")
            .localCheckpoint(eager=True)  # the ONE job of this superstep
        )
        changed = obs.get["n_changed"] or 0
        if changed == 0:
            break
    if changed:
        raise ConvergenceError(
            f"connected_components did not converge in {max_iter} supersteps "
            f"({changed} labels still changing); raise max_iter — returning "
            "these labels would silently split components"
        )
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
