"""Similarity search over embedding columns (task mandate):
brute-force cosine top-k (exact baseline) + bucketed/IVF scale paths.

Scale notes: brute force is a query-broadcast crossJoin — right shape
when |queries| is small (the query side broadcasts; the corpus scan
stays partition-parallel and never shuffles). The IVF variant
pre-clusters the corpus (k centroids via deterministic seeded
mini-batch), assigns each vector to its nearest centroid partition, and
probes only n_probe centroid partitions per query — the standard
recall/cost dial. Pandas-UDF matrix kernels (numpy BLAS) do the inner
loop when dims x rows get big enough to matter."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.vectors import cosine, l2_norm


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_salts: int = 32,
) -> DataFrame:
    """Exact cosine top-k: broadcast the (small) query set against the
    corpus, score JVM-side with zip_with/aggregate, take k per query.
    Deterministic tiebreak on neighbor id.

    Top-k is a SALTED TWO-LEVEL rank (VERDICT r3 #2): a single
    ``Window.partitionBy(query_id)`` over the scored crossJoin would
    shuffle EVERY query's entire scored corpus into one task's sort —
    the per-query single-partition bottleneck at 10^9 corpus rows.
    Level 1 ranks within (query_id, salt-of-neighbor) cells, so the
    exchange spreads each query over ``n_salts`` tasks and each sort
    sees corpus/n_salts rows; level 2 ranks the surviving
    <= k * n_salts rows per query — bounded by k, not by the corpus.
    Exact: the global top-k is a subset of the union of per-salt
    top-ks. (Same pattern as the bounded-provenance rollup in
    operators/graph.py.) The mapInPandas variant below additionally
    pre-reduces map-side and is the preferred path at real dims."""
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("score"),
    )
    salted = scored.withColumn(
        "__salt", F.pmod(F.xxhash64("neighbor_id"), F.lit(n_salts))
    )
    w1 = Window.partitionBy("query_id", "__salt").orderBy(F.desc("score"), "neighbor_id")
    survivors = (
        salted.withColumn("__r", F.row_number().over(w1))
        .filter(F.col("__r") <= k)
        .drop("__r", "__salt")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), "neighbor_id")
    return (
        survivors.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "score", "rnk")
    )


def brute_force_topk_pandas(
    corpus: DataFrame,
    queries_pdf: pd.DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Arrow/numpy variant: queries ship to every partition inside the
    UDF closure as one dense matrix; each Arrow batch scores against all
    queries with one BLAS matmul, emitting per-batch partial top-k that
    a global window finalizes. ~10-100x the zip_with path at real dims."""
    import numpy as np

    qids = queries_pdf[id_col].to_numpy()
    Q = np.vstack(queries_pdf[vec_col].to_numpy()).astype("float64")
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)

    out_type = T.StructType(
        [
            T.StructField("query_id", T.LongType()),
            T.StructField("neighbor_id", T.LongType()),
            T.StructField("score", T.DoubleType()),
        ]
    )

    def score_batches(it):
        for pdf in it:
            if len(pdf) == 0:
                continue
            C = np.vstack(pdf[vec_col].to_numpy()).astype("float64")
            Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
            S = Cn @ Qn.T  # (batch, n_queries)
            nb = min(k, len(pdf))
            top = np.argpartition(-S, nb - 1, axis=0)[:nb]  # per-query partial top-k
            rows = []
            for qi in range(S.shape[1]):
                for ci in top[:, qi]:
                    rows.append((int(qids[qi]), int(pdf[id_col].iloc[ci]), round(float(S[ci, qi]), 6)))
            yield pd.DataFrame(rows, columns=["query_id", "neighbor_id", "score"])

    partial = corpus.mapInPandas(score_batches, schema=out_type)
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), "neighbor_id")
    return (
        partial.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "score", "rnk")
    )


def sign_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_bits: int = 2,
) -> DataFrame:
    """Bucketed (sign-LSH) approximate top-k: both sides bucket on the
    sign pattern of the first ``n_bits`` coordinates; scoring probes
    only the query's bucket. Approximate by design — recall depends on
    bucket agreement — but 2^n_bits times cheaper; the deterministic
    bucket rule keeps it oracle-checkable."""
    from ..functions.vectors import norm_bucket

    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm_bucket(F.col(vec_col), 2**n_bits).alias("bucket"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        norm_bucket(F.col(vec_col), 2**n_bits).alias("bucket"),
    )
    scored = c.join(F.broadcast(q), "bucket").select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), "neighbor_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "score", "rnk")
    )


def train_ivf_centroids(
    X, k: int = 16, seed: int = 42, iters: int = 5
) -> list[list[float]]:
    """Deterministic spherical k-means (cosine) over a bounded training
    sample — numpy only, fixed seed, fixed iteration count, sequential
    reductions, so the same bytes in always give the same centroids out
    (the oracle SQL embeds them as literals).

    Scale note: this runs DRIVER-SIDE on a bounded sample (<=100k
    vectors is plenty — the standard IVF practice: faiss trains coarse
    quantizers on a sample too); the expensive parts (corpus->centroid
    assignment, probing, scoring) stay distributed in ``ivf_topk``.
    Replaces the round-1 first-N-by-id stand-in whose centroids were
    degenerate on id-correlated corpora (ADVICE r1)."""
    import numpy as np

    X = np.asarray(X, dtype="float64")
    n = len(X)
    k = min(k, n)
    Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    C = Xn[rng.choice(n, size=k, replace=False)]
    for _ in range(iters):
        # argmax takes the FIRST max -> deterministic tie-break on index
        assign = np.argmax(Xn @ C.T, axis=1)
        for j in range(k):
            members = Xn[assign == j]
            if len(members):
                m = members.mean(axis=0)
                nm = np.linalg.norm(m)
                if nm > 1e-12:
                    C[j] = m / nm
    # round so the SQL literal and the Spark literal are the same short
    # decimal (repr round-trips doubles exactly on both engines)
    return [[float(round(v, 6)) for v in row] for row in C]


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF (inverted-file) ANN: corpus vectors are assigned to their
    nearest centroid (one broadcast score pass); queries probe their
    ``n_probe`` nearest centroid lists only.

    ``centroids``: trained centroid vectors (``train_ivf_centroids``) —
    the quality path. When omitted, falls back to a deterministic
    seeded hash-sample of corpus vectors (better than first-N-by-id on
    id-correlated corpora, still untrained)."""
    spark = corpus.sparkSession
    if centroids is not None:
        # FUSED single-pass IVF (r7): probe selection runs DRIVER-SIDE
        # in numpy (queries are broadcast-sized by contract — the prior
        # shape already collected them into a broadcast relation, via a
        # crossJoin + window subplan), and cell assignment + scoring
        # fuse into ONE Arrow kernel per corpus batch: assign the batch
        # (argmax over the centroid gemm — identical to the old
        # assignment kernel), mask each query's scores to the rows
        # whose home cell is among that query's n_probe cells, and emit
        # an exact per-batch partial top-k (lexsort on (-score, id) —
        # the oracle's tiebreak). The old plan's probe crossJoin +
        # window, broadcast-hash join, and INTERPRETED JVM zip_with
        # cosine (the scored join) all disappear; the only post-kernel
        # work is the k-bounded global window. Scoring backend is the
        # same normalize/gemm/round(6) kernel ann_topk_pandas proves
        # oracle-equal on this data; probe ranking reproduces the
        # (desc rounded sim, centroid_id) window via stable argsort.
        import numpy as np

        q_pdf = queries.select(id_col, vec_col).toPandas()
        if not len(q_pdf):
            # parity with the old lazy plan: zero queries -> zero rows
            # (np.vstack on an empty query matrix would raise instead)
            return spark.createDataFrame(
                [],
                T.StructType(
                    [
                        T.StructField("query_id", queries.schema[id_col].dataType),
                        T.StructField("neighbor_id", corpus.schema[id_col].dataType),
                        T.StructField("score", T.DoubleType()),
                        T.StructField("rnk", T.LongType()),
                    ]
                ),
            )
        qids = q_pdf[id_col].to_numpy()
        Q = np.vstack(q_pdf[vec_col].to_numpy()).astype("float64")
        Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
        Cm = np.asarray([list(map(float, cc)) for cc in centroids], dtype="float64")
        Cn_ = Cm / np.maximum(np.linalg.norm(Cm, axis=1, keepdims=True), 1e-12)
        qsims = np.round(Qn @ Cn_.T, 6)
        m = min(n_probe, len(Cm))
        probe_cells = np.argsort(-qsims, axis=1, kind="stable")[:, :m]  # ties -> low id
        probed = np.zeros((len(Cm), len(qids)), dtype=bool)
        for qi in range(len(qids)):
            probed[probe_cells[qi], qi] = True

        out_type = T.StructType(
            [
                T.StructField("query_id", queries.schema[id_col].dataType),
                T.StructField("neighbor_id", corpus.schema[id_col].dataType),
                T.StructField("score", T.DoubleType()),
            ]
        )
        kk = k

        def score_probed(batches):
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.vstack(pdf.iloc[:, 1].to_numpy()).astype("float64")
                Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
                assign = np.argmax(np.round(Xn @ Cn_.T, 6), axis=1)
                S = np.round(Xn @ Qn.T, 6)
                mask = probed[assign]  # (batch, n_queries)
                ids = pdf.iloc[:, 0].to_numpy()
                rows = []
                for qi in range(len(qids)):
                    idx = np.nonzero(mask[:, qi])[0]
                    if not len(idx):
                        continue
                    # exact per-batch top-k under the global tiebreak;
                    # _py unwraps numpy scalars but passes string/object
                    # ids through (the id column type is caller-defined)
                    _py = lambda v: v.item() if hasattr(v, "item") else v  # noqa: E731
                    order = idx[np.lexsort((ids[idx], -S[idx, qi]))][:kk]
                    rows.extend(
                        (_py(qids[qi]), _py(ids[ci]), float(S[ci, qi]))
                        for ci in order
                    )
                if rows:
                    yield pd.DataFrame(rows, columns=["query_id", "neighbor_id", "score"])

        partial = corpus.select(id_col, vec_col).mapInPandas(score_probed, schema=out_type)
        w = Window.partitionBy("query_id").orderBy(F.desc("score"), "neighbor_id")
        return (
            partial.withColumn("rnk", F.row_number().over(w).cast("long"))
            .filter(F.col("rnk") <= k)
            .select("query_id", "neighbor_id", "score", "rnk")
        )
    cent = (
        corpus.orderBy(F.xxhash64(F.col(id_col), F.lit(seed)), id_col)
        .limit(n_centroids)
        .select(F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("centv"))
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    w_assign = Window.partitionBy("neighbor_id").orderBy(F.desc("sim"), "centroid_id")
    assigned = (
        c.crossJoin(F.broadcast(cent))
        .select("neighbor_id", "cv", "centroid_id", F.round(cosine(F.col("cv"), F.col("centv")), 6).alias("sim"))
        .withColumn("rn", F.row_number().over(w_assign))
        .filter(F.col("rn") == 1)
        .select("neighbor_id", "cv", "centroid_id")
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    w_probe = Window.partitionBy("query_id").orderBy(F.desc("sim"), "centroid_id")
    probes = (
        q.crossJoin(F.broadcast(cent))
        .select("query_id", "qv", "centroid_id", F.round(cosine(F.col("qv"), F.col("centv")), 6).alias("sim"))
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= n_probe)
        .select("query_id", "qv", "centroid_id")
    )
    scored = assigned.join(F.broadcast(probes), "centroid_id").select(
        "query_id",
        "neighbor_id",
        F.round(cosine(F.col("qv"), F.col("cv")), 6).alias("score"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), "neighbor_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
        .select("query_id", "neighbor_id", "score", "rnk")
    )


def ivf_cell_assignments(
    corpus: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_probe: int = 1,
) -> DataFrame:
    """Assign every vector to its ``n_probe`` nearest IVF cells —
    (id, vec, centroid_id, cell_rank 1..n_probe) — with the same
    Arrow-batched gemm kernel ``ivf_topk`` uses for its top-1
    assignment: one BLAS matmul per batch, no shuffle, no k-times
    crossJoin explosion. Stable argsort on (-sim) reproduces the
    (sim desc, centroid_id asc) tiebreak the DuckDB oracle uses."""
    import numpy as np

    c = corpus.select(F.col(id_col).alias("vid"), F.col(vec_col).alias("v"))
    out_type = T.StructType(
        [
            T.StructField("vid", corpus.schema[id_col].dataType),
            T.StructField("v", corpus.schema[vec_col].dataType),
            T.StructField("centroid_id", T.IntegerType()),
            T.StructField("cell_rank", T.IntegerType()),
        ]
    )
    cents = [list(map(float, cc)) for cc in centroids]
    m = min(n_probe, len(cents))

    def assign_batches(batches):
        C = np.asarray(cents, dtype="float64")
        Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.vstack(pdf.iloc[:, 1].to_numpy()).astype("float64")
            Xn = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
            sims = np.round(Xn @ Cn.T, 6)
            top = np.argsort(-sims, axis=1, kind="stable")[:, :m]  # ties -> low id
            n = len(pdf)
            yield pd.DataFrame(
                {
                    "vid": np.repeat(pdf.iloc[:, 0].values, m),
                    "v": pdf.iloc[:, 1].values.repeat(m),
                    "centroid_id": top.reshape(-1).astype("int32"),
                    "cell_rank": np.tile(np.arange(1, m + 1, dtype="int32"), n),
                }
            )

    return c.mapInPandas(assign_batches, schema=out_type)


def ivf_join_pairs(
    corpus: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    n_probe: int = 2,
) -> DataFrame:
    """CORPUS-vs-CORPUS ANN (VERDICT r3 #7) — the semantic-dedup shape
    where BOTH sides are the whole corpus, so nothing can broadcast.
    Every vector gets a home cell (rank 1) and probes its ``n_probe``
    nearest cells; only (probe, home) pairs sharing a cell score.
    The cell equi-join shuffles each side once on centroid_id and pair
    work is sum-over-cells |probes_c| x |homes_c| — the n_probe/k cost
    dial — never all-pairs. Exact cosine verify >= threshold on the
    candidates; pairs reachable through several shared cells dedup via
    distinct (the score is deterministic per pair).

    Recall is the IVF recall curve (BENCH/BASELINE.md): a pair is
    found iff either member's home cell is among the other's probes —
    near-identical vectors share a home cell at any n_probe >= 1."""
    assigned = ivf_cell_assignments(
        corpus, centroids, id_col=id_col, vec_col=vec_col, n_probe=n_probe
    )
    # one assignment pass serves both sides of the self-join; cut the
    # kernel lineage so Catalyst sees two leaf scans, not a self-join
    # over a Python-kernel plan (the measured analysis pathology from
    # operators/dedup.py)
    assigned = assigned.localCheckpoint(eager=True)
    probes = assigned.select(
        F.col("vid").alias("id_a"), F.col("v").alias("va"), "centroid_id"
    )
    homes = assigned.filter(F.col("cell_rank") == 1).select(
        F.col("vid").alias("id_b"), F.col("v").alias("vb"), "centroid_id"
    )
    # pair scoring crosses to Python Arrow-batched — the JVM
    # zip_with/aggregate cosine runs INTERPRETED per element (measured
    # ~20 s for 500k 64-dim pairs at sf0.1 vs <1 s vectorized).
    # r7: mapInArrow instead of a pandas_udf — the pandas path
    # materializes every vector cell as a per-row numpy object before
    # the kernel can vstack them, which dominated the stage (~1.9 s for
    # the 500k-pair stream); reading the ListArray's flat value buffer
    # directly reshapes the whole batch zero-copy. The kernel emits the
    # RAW cosine only for rows >= threshold - 1e-6 (round(6) moves a
    # value by <= 5e-7, so this is a strict superset of the final
    # predicate); the authoritative round+threshold+distinct stays in
    # SQL, identical to the prior plan — same einsum formula, same
    # F.round, same pair set.
    import numpy as np
    import pyarrow as pa

    floor = threshold - 1e-6

    def _mat(col, n):
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        try:
            widths = np.diff(arr.offsets.to_numpy())
            uniform = n > 0 and widths.size == n and (widths == widths[0]).all()
        except (AttributeError, TypeError):
            uniform = False
        if uniform:
            flat = arr.flatten().to_numpy(zero_copy_only=False).astype("float64")
            return flat.reshape(n, int(widths[0]))
        return np.vstack(arr.to_pylist()).astype("float64")  # ragged fallback

    def score_arrow(batches):
        for rb in batches:
            n = rb.num_rows
            if not n:
                continue
            A = _mat(rb.column(1), n)
            B = _mat(rb.column(3), n)
            denom = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
            d = np.einsum("ij,ij->i", A, B)
            cos = np.where(denom > 0, d / np.maximum(denom, 1e-300), 0.0)
            keep = cos >= floor
            if not keep.any():
                continue
            idx = np.nonzero(keep)[0]
            yield pa.RecordBatch.from_arrays(
                [
                    rb.column(0).take(pa.array(idx)),
                    rb.column(2).take(pa.array(idx)),
                    pa.array(cos[idx], type=pa.float64()),
                ],
                names=["id_a", "id_b", "__raw"],
            )

    idt = corpus.schema[id_col].dataType
    pair_stream = (
        probes.join(homes, "centroid_id")
        .filter(F.col("id_a") != F.col("id_b"))
        .select("id_a", "va", "id_b", "vb")
    )
    raw = pair_stream.mapInArrow(
        score_arrow,
        schema=T.StructType(
            [
                T.StructField("id_a", idt),
                T.StructField("id_b", idt),
                T.StructField("__raw", T.DoubleType()),
            ]
        ),
    )
    scored = (
        raw.select(
            F.least("id_a", "id_b").alias("id_a"),
            F.greatest("id_a", "id_b").alias("id_b"),
            F.round(F.col("__raw"), 6).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
        .distinct()
    )
    return scored
