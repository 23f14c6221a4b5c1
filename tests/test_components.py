"""Hash-min connected components vs a pure-python union-find oracle —
property-style over seeded random graphs (SURVEY.md §5.2)."""

from __future__ import annotations

import random

import pytest

from pysql2neo4j_spark.operators.components import (
    ConvergenceError,
    connected_components,
)


def _union_find_oracle(vertices, edges):
    parent = {v: v for v in vertices}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in vertices}


def _check(spark, vertices, edges):
    vdf = spark.createDataFrame([(v,) for v in vertices], ["id"])
    edf = spark.createDataFrame(edges or [("__none__", "__none__")], ["src", "dst"])
    if not edges:
        edf = edf.filter("src <> src")  # empty
    want = _union_find_oracle(vertices, edges)
    # both routes must agree with the oracle: the gated driver
    # union-find (default — these graphs are tiny) AND the distributed
    # superstep loop (forced via small_graph_threshold=0)
    got_fast = {r.id: r.component for r in connected_components(vdf, edf).collect()}
    assert got_fast == want
    got_dist = {
        r.id: r.component
        for r in connected_components(vdf, edf, small_graph_threshold=0).collect()
    }
    assert got_dist == want


def test_cc_random_graphs(spark):
    for seed in (0, 1, 2):
        rng = random.Random(seed)
        n = 60
        vertices = [f"v{i:03d}" for i in range(n)]
        edges = [
            (vertices[rng.randrange(n)], vertices[rng.randrange(n)])
            for _ in range(rng.randrange(10, 80))
        ]
        _check(spark, vertices, edges)


def test_cc_path_graph_converges(spark):
    """A long path is hash-min's worst case (O(diameter) supersteps)."""
    n = 24
    vertices = [f"p{i:03d}" for i in range(n)]
    edges = [(vertices[i], vertices[i + 1]) for i in range(n - 1)]
    _check(spark, vertices, edges)


def test_cc_no_edges_singletons(spark):
    vertices = [f"s{i}" for i in range(10)]
    _check(spark, vertices, [])


def test_cc_long_path_log_rounds(spark):
    """Pointer-jump compression makes deep chains O(log diameter):
    a 300-hop path must close well inside 12 supersteps (plain hash-min
    would need 299)."""
    n = 300
    vertices = [f"q{i:04d}" for i in range(n)]
    edges = [(vertices[i], vertices[i + 1]) for i in range(n - 1)]
    vdf = spark.createDataFrame([(v,) for v in vertices], ["id"])
    edf = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r.id: r.component
        for r in connected_components(vdf, edf, max_iter=12, small_graph_threshold=0).collect()
    }
    assert got == {v: vertices[0] for v in vertices}


def test_cc_nonconvergence_raises(spark):
    """Exhausting max_iter with labels still moving must RAISE, never
    return silently-wrong (split) components."""
    n = 64
    vertices = [f"r{i:03d}" for i in range(n)]
    edges = [(vertices[i], vertices[i + 1]) for i in range(n - 1)]
    vdf = spark.createDataFrame([(v,) for v in vertices], ["id"])
    edf = spark.createDataFrame(edges, ["src", "dst"])
    with pytest.raises(ConvergenceError):
        connected_components(vdf, edf, max_iter=2, small_graph_threshold=0)


def test_cc_min_label_is_component_id(spark):
    vdf = spark.createDataFrame([("b",), ("a",), ("c",), ("z",)], ["id"])
    edf = spark.createDataFrame([("b", "c"), ("c", "a")], ["src", "dst"])
    got = dict(
        (r.id, r.component) for r in connected_components(vdf, edf).collect()
    )
    assert got == {"a": "a", "b": "a", "c": "a", "z": "z"}


def test_cc_probe_overflow_falls_through_to_superstep_loop(spark):
    """small_graph_threshold > 0 but edges exceed it: the route probe
    must fall through to the distributed loop and still be exact."""
    n = 40
    vertices = [f"p{i:03d}" for i in range(n)]
    edges = [(vertices[i], vertices[i + 1]) for i in range(n - 1)]
    vdf = spark.createDataFrame([(v,) for v in vertices], ["id"])
    edf = spark.createDataFrame(edges, ["src", "dst"])
    got = {
        r.id: r.component
        for r in connected_components(vdf, edf, small_graph_threshold=10).collect()
    }
    assert got == {v: vertices[0] for v in vertices}


def test_cc_large_mapping_uses_broadcast_join_branch(spark):
    """>4096 labeled vertices exercises the broadcast-join attach (the
    literal-map shape caps at 4096 entries); result equality with the
    small-graph answer is the gate."""
    pairs = [(2 * i, 2 * i + 1) for i in range(3000)]  # 6000 labels
    verts = [(x,) for p in pairs for x in p] + [(999_999,)]  # + a singleton
    vdf = spark.createDataFrame(verts, ["id"])
    edf = spark.createDataFrame(pairs, ["src", "dst"])
    got = {
        r.id: r.component
        for r in connected_components(vdf, edf, small_graph_threshold=100_000).collect()
    }
    expect = {x: min(p) for p in pairs for x in p}
    expect[999_999] = 999_999
    assert got == expect


def test_release_local_checkpoint_frees_blocks(spark):
    """ADVICE r5: the route probe's directed-edge-list checkpoint must
    be releasable once sym (or the union-find result) materializes —
    two edge-list-sized copies held for the query lifetime is exactly
    the large-route memory shape the advice flagged. The helper frees
    the blocks NOW (not at driver GC); the frame is dead afterwards by
    contract."""
    from pysql2neo4j_spark.operators.components import _release_local_checkpoint

    jsc = spark.sparkContext._jsc.sc()

    def ids():
        m = jsc.getPersistentRDDs()
        it, out = m.iterator(), set()
        while it.hasNext():
            out.add(it.next()._1())
        return out

    before = ids()
    df = spark.range(10_000).selectExpr("id as src", "id + 1 as dst").localCheckpoint(
        eager=True
    )
    new = ids() - before
    assert len(new) == 1, f"expected exactly one new persistent RDD, got {new}"
    _release_local_checkpoint(df)
    assert not (ids() & new), "checkpoint blocks still persistent after release"
