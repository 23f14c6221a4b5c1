"""Embedding-vector primitives over ``array<float>`` columns.

Dot products / norms use ``F.zip_with`` + ``F.aggregate`` — JVM-side,
no UDF — so brute-force similarity scans stay inside whole-stage
codegen. (A Pandas-UDF variant exists in operators/similarity.py for
the batched top-k path where numpy BLAS wins.)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot(a, b) / denom).otherwise(F.lit(0.0))


def norm_bucket(a: Column, n_buckets: int = 16) -> Column:
    """Cheap deterministic LSH-ish bucket: sign bits of the first
    log2(n_buckets) random-projection-free axes (uses raw coordinate
    signs — adequate for bucketed pre-filtering demos; the scale path
    is IVF with learned centroids, stubbed in operators/similarity.py)."""
    import math

    bits = int(math.log2(n_buckets))
    out = F.lit(0)
    for j in range(bits):
        out = out + F.when(F.element_at(a, j + 1) >= 0, F.lit(1 << j)).otherwise(F.lit(0))
    return out


# (r7) the former cosine_pandas pandas_udf factory was removed: its
# only caller, similarity.ivf_join_pairs, now scores pair streams via
# a mapInArrow kernel that reads the list buffers zero-copy — the
# pandas path materialized every vector cell as a per-row object
# first, which dominated the stage. Rowwise-vectorized cosine for pair
# streams lives there.
