"""Corpus generator invariants (FIXTURES.md §B)."""

from __future__ import annotations

import itertools

from pysql2neo4j_spark.corpus import (
    HOT_TOOL,
    build_gazetteer,
    generate_corpus,
    normalize_surface,
)


def _shingles(s: str, k: int) -> set[str]:
    return {s[i : i + k] for i in range(max(len(s) - k + 1, 1))}


def _hybrid(a: str, b: str, cut: int = 7) -> float:
    k = 2 if min(len(a), len(b)) <= cut else 3
    A, B = _shingles(a, k), _shingles(b, k)
    m = min(len(A), len(B))
    return len(A & B) / m if m else 0.0


def test_deterministic():
    t1, g1 = generate_corpus(n_convs=40, seed=7)
    t2, g2 = generate_corpus(n_convs=40, seed=7)
    assert t1.equals(t2) and g1.equals(g2)
    t3, _ = generate_corpus(n_convs=40, seed=8)
    assert not t1.equals(t3)


def test_schema_and_grain():
    t, _ = generate_corpus(n_convs=30)
    assert list(t.columns) == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert not t.duplicated(["conv_id", "turn_idx"]).any()
    # ts strictly increasing within each conversation
    assert (t.sort_values(["conv_id", "turn_idx"]).groupby("conv_id")["ts"].diff().dropna()
            > __import__("pandas").Timedelta(0)).all()


def test_gazetteer_similarity_margins():
    """The clustering contract: every entity's alias graph is connected
    at threshold 0.63 under hybrid containment, and no cross-entity pair
    reaches it (tests the corpus, not the engine)."""
    ents = build_gazetteer()
    norm2ent = {}
    for e in ents:
        for a in e.aliases:
            n = normalize_surface(a)
            assert norm2ent.get(n, e.key) == e.key, f"norm collision: {n}"
            norm2ent[n] = e.key
    norms = sorted(norm2ent)
    th = 0.63
    for a, b in itertools.combinations(norms, 2):
        if norm2ent[a] != norm2ent[b]:
            assert _hybrid(a, b) < th, (a, b, _hybrid(a, b))
    for e in ents:
        ns = sorted({normalize_surface(a) for a in e.aliases})
        for a in ns:
            if len(ns) > 1:
                assert max(_hybrid(a, b) for b in ns if b != a) >= th, (a, e.key)


def test_hot_entity_share():
    """~30% of tool-typed object mentions hit the hot entity (skew test
    fixture, SURVEY.md §5.2)."""
    _, gold = generate_corpus(n_convs=300)
    hot_norm = HOT_TOOL
    tool_objs = gold[gold.obj_key.str.startswith("tool:")]
    share = (tool_objs.obj_canonical == hot_norm).mean()
    assert 0.4 < share < 0.6  # 50% of tool picks
    all_share = (gold.obj_canonical == hot_norm).mean()
    assert 0.2 < all_share < 0.45
