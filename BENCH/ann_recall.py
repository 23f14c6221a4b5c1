"""ANN recall/cost characterization (VERDICT r2 'What's missing' #4).

A user tuning ANN at 100 TB needs the recall-vs-cost trade measured,
not asserted: this harness sweeps IVF over n_probe and sign-LSH over
n_bits on two corpora — the sf embeddings fixture (isotropic random
vectors, ANN's WORST case: no cluster structure to exploit) and a
planted-cluster corpus (ANN's intended case) — and reports recall@5
against the exact brute-force top-5 plus the scanned fraction of the
corpus (the cost proxy that scales: scanned_fraction * corpus_bytes is
what each query actually reads at any scale).

Usage: python BENCH/ann_recall.py [sf_dir]     (default sf0.01)
Prints a markdown table + one JSON line; paste the table into
BENCH/BASELINE.md when the numbers move.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 5


def exact_topk(Xc, ids_c, Xq, ids_q, k=K):
    Xcn = Xc / np.linalg.norm(Xc, axis=1, keepdims=True)
    Xqn = Xq / np.linalg.norm(Xq, axis=1, keepdims=True)
    S = np.round(Xcn @ Xqn.T, 6)
    out = {}
    for qi, qid in enumerate(ids_q):
        order = sorted(zip(-S[:, qi], ids_c), key=lambda t: (t[0], t[1]))[:k]
        out[int(qid)] = {int(c) for _, c in order}
    return out


def recall_of(got_df, exact):
    got = {}
    for r in got_df.collect():
        got.setdefault(int(r.query_id), set()).add(int(r.neighbor_id))
    hits = sum(len(exact[q] & got.get(q, set())) for q in exact)
    return hits / (len(exact) * K)


def load_fixture(spark, sf_dir):
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    rows = emb.orderBy("vec_id").collect()
    ids = np.array([r.vec_id for r in rows])
    X = np.array([r.embedding for r in rows], dtype=np.float64)
    qmask = ids < 10
    corpus = emb.filter("vec_id >= 10")
    queries = emb.filter("vec_id < 10")
    return corpus, queries, X[~qmask], ids[~qmask], X[qmask], ids[qmask]


def make_planted(spark, n_clusters=16, per_cluster=200, dim=64, n_queries=16, seed=7):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, dim)) * 5.0
    crows, vid = [], 100
    for c in centers:
        for _ in range(per_cluster):
            crows.append((vid, (c + rng.normal(size=dim) * 0.15).tolist()))
            vid += 1
    qrows = [
        (qi, (centers[qi % n_clusters] + rng.normal(size=dim) * 0.15).tolist())
        for qi in range(n_queries)
    ]
    corpus = spark.createDataFrame(crows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    queries = spark.createDataFrame(qrows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    Xc = np.array([r[1] for r in crows])
    Xq = np.array([r[1] for r in qrows])
    ids_c = np.array([r[0] for r in crows])
    ids_q = np.array([r[0] for r in qrows])
    return corpus, queries, Xc, ids_c, Xq, ids_q


def ivf_scan_fraction(assigned_sizes, probes_per_query):
    # probed-list mass / corpus mass, averaged over queries
    return float(np.mean([sum(s) for s in probes_per_query]) / sum(assigned_sizes))


def sweep(spark, name, corpus, queries, Xc, ids_c, Xq, ids_q, results):
    from pysql2neo4j_spark.operators.similarity import (
        ivf_topk,
        sign_lsh_topk,
        train_ivf_centroids,
    )

    exact = exact_topk(Xc, ids_c, Xq, ids_q)
    n_cent = 16
    cents = train_ivf_centroids(Xc, k=n_cent, seed=42, iters=5)

    # driver-side replicas of the assignment/probe rules for the cost column
    C = np.array(cents)
    Xcn = Xc / np.linalg.norm(Xc, axis=1, keepdims=True)
    Xqn = Xq / np.linalg.norm(Xq, axis=1, keepdims=True)
    assign = np.argmax(np.round(Xcn @ C.T, 6), axis=1)
    sizes = np.bincount(assign, minlength=n_cent)
    qsim = np.round(Xqn @ C.T, 6)

    for n_probe in (1, 2, 4, 8, 16):
        rec = recall_of(
            ivf_topk(corpus, queries, k=K, n_centroids=n_cent,
                     n_probe=n_probe, centroids=[list(c) for c in cents]),
            exact,
        )
        probed = [sizes[np.argsort(-row, kind="stable")[:n_probe]] for row in qsim]
        frac = float(np.mean([p.sum() for p in probed]) / len(Xc))
        results.append({"corpus": name, "index": "ivf", "param": f"n_probe={n_probe}",
                        "recall_at_5": round(rec, 4), "scan_fraction": round(frac, 4)})

    for n_bits in (1, 2, 3, 4):
        rec = recall_of(
            sign_lsh_topk(corpus, queries, k=K, n_bits=n_bits), exact
        )
        # bucket rule replica: fraction of corpus sharing the query bucket
        import pyspark.sql.functions as F

        from pysql2neo4j_spark.functions.vectors import norm_bucket

        cb = corpus.select(norm_bucket(F.col("embedding"), 2 ** n_bits).alias("b"))
        qb = queries.select(norm_bucket(F.col("embedding"), 2 ** n_bits).alias("b"))
        csizes = {r.b: r["count"] for r in cb.groupBy("b").count().collect()}
        qn = [csizes.get(r.b, 0) for r in qb.collect()]
        frac = float(np.mean(qn) / len(Xc))
        results.append({"corpus": name, "index": "sign_lsh", "param": f"n_bits={n_bits}",
                        "recall_at_5": round(rec, 4), "scan_fraction": round(frac, 4)})


def sweep_join(spark, name, corpus, Xc, ids_c, threshold, results):
    """Corpus-vs-corpus IVF-cell join (ivf_join_pairs): PAIR recall vs
    the exact above-threshold pair set, over n_probe. Cost column =
    candidate pairs / all pairs (the fraction of the quadratic pair
    space the cell join actually scores)."""
    from pysql2neo4j_spark.operators.similarity import (
        ivf_join_pairs,
        train_ivf_centroids,
    )

    Xn = Xc / np.linalg.norm(Xc, axis=1, keepdims=True)
    S = np.round(Xn @ Xn.T, 6)
    n = len(Xc)
    want = set()
    for i in range(n):
        for j in range(i + 1, n):
            if S[i, j] >= threshold:
                a, b = int(ids_c[i]), int(ids_c[j])
                want.add((min(a, b), max(a, b)))
    if not want:
        return
    n_cent = 16
    cents = train_ivf_centroids(Xc, k=n_cent, seed=42, iters=5)
    C = np.array(cents)
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    sims = np.round(Xn @ Cn.T, 6)
    order = np.argsort(-sims, axis=1, kind="stable")
    home = order[:, 0]
    home_sizes = np.bincount(home, minlength=n_cent)
    for n_probe in (1, 2, 4):
        got = {
            (int(r.id_a), int(r.id_b))
            for r in ivf_join_pairs(
                corpus, [list(c) for c in cents],
                threshold=threshold, n_probe=n_probe,
            ).collect()
        }
        rec = len(got & want) / len(want)
        probe_sizes = np.bincount(order[:, :n_probe].reshape(-1), minlength=n_cent)
        # minus self pairs: a vector is a HOME only in its rank-1
        # cell, so exactly n (id, id) pairs exist regardless of n_probe
        cand = int((probe_sizes * home_sizes).sum()) - n
        frac = cand / (n * (n - 1))  # ordered-pair space (each pair seen from both sides)
        results.append({"corpus": name, "index": "ivf_join",
                        "param": f"n_probe={n_probe}, th={threshold}",
                        "recall_at_5": round(rec, 4),
                        "scan_fraction": round(frac, 4)})


def main():
    from pysql2neo4j_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="ann_recall", master="local[8]")
    spark.sparkContext.setLogLevel("ERROR")

    results: list[dict] = []
    fixture = load_fixture(spark, sf_dir)
    sweep(spark, "isotropic(sf)", *fixture, results)
    planted = make_planted(spark)
    sweep(spark, "planted(16x200)", *planted, results)
    # corpus-vs-corpus pair recall (the semantic-dedup shape): the full
    # fixture table against itself at its near-dup band, and the
    # planted clusters at a tight threshold
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    rows = emb.orderBy("vec_id").collect()
    ids_all = np.array([r.vec_id for r in rows])
    X_all = np.array([r.embedding for r in rows], dtype=np.float64)
    sweep_join(spark, "isotropic(sf)", emb, X_all, ids_all, 0.45, results)
    corpus_p, _q, Xc_p, ids_p, _xq, _iq = planted
    sweep_join(spark, "planted(16x200)", corpus_p, Xc_p, ids_p, 0.9, results)

    print(f"\n| corpus | index | param | recall@{K} | scan_fraction |")
    print("|---|---|---|---|---|")
    for r in results:
        print(f"| {r['corpus']} | {r['index']} | {r['param']} | "
              f"{r['recall_at_5']:.3f} | {r['scan_fraction']:.3f} |")
    print()
    print(json.dumps({"metric": "ann_recall_curves", "sf": sf_dir, "rows": results}))
    spark.stop()


if __name__ == "__main__":
    main()
