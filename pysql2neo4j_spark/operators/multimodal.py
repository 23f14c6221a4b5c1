"""Multimodal column plumbing (task mandate): image/audio/video as
opaque ``binary`` columns with typed metadata structs, processed by
Arrow-batched ``mapInPandas`` kernels.

The decode kernels themselves are STUBBED — this container has no
image/audio libraries — behind ``decoder=`` seams: the default
``"fake"`` decoder is a deterministic pure function of the bytes (so
the plumbing is fully testable and oracle-checkable), while
``"pillow"``/``"ffmpeg"`` raise ``NotImplementedError`` with the exact
dependency needed. The Spark-side contract — schema, partitioning,
UDF signature, Arrow batch shape — is real and tested
(tests/test_multimodal.py)."""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("content", T.BinaryType(), False),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
            False,
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("byte_sum_mod", T.LongType(), False),
        T.StructField("first_byte", T.IntegerType(), True),
        T.StructField("feature", T.ArrayType(T.DoubleType()), False),
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Fixture adapter: treat document text bytes as opaque media blobs
    (the only binary payloads available in this sandbox) with typed
    metadata — the schema a real image/audio table would carry."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(F.encode(F.col("text"), "UTF-8")).cast("long").alias("n_bytes"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def _fake_decode(content: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a decode+embed kernel: bucketed byte
    histogram, normalized. Pure function of the bytes."""
    if content is None:
        return [0.0] * dim
    counts = [0] * dim
    for b in content:
        counts[b % dim] += 1
    n = max(len(content), 1)
    return [round(c / n, 6) for c in counts]


def extract_features(
    media: DataFrame, decoder: str = "fake", batch_dim: int = 8
) -> DataFrame:
    """Decode / feature-extract via mapInPandas (one Arrow crossing per
    batch of blobs). ``decoder="fake"`` is the deterministic stub; real
    decoders are declared-but-unavailable in this container."""
    if decoder not in ("fake",):
        raise NotImplementedError(
            f"decoder {decoder!r} requires media libraries not present in this "
            "container (pillow/torchaudio/ffmpeg); the 'fake' decoder exercises "
            "the identical Spark plumbing"
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": content.map(lambda b: len(b) if b is not None else 0),
                    "byte_sum_mod": content.map(
                        lambda b: int(sum(b) % 997) if b is not None else 0
                    ),
                    "first_byte": content.map(
                        lambda b: int(b[0]) if b is not None and len(b) else None
                    ),
                    "feature": content.map(lambda b: _fake_decode(b, batch_dim)),
                }
            )

    return media.mapInPandas(kernel, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: expands each video row into frame
    rows (timestamps only — the pixel decode is the stubbed kernel
    above). Shows the explode-shaped schema a real sampler emits."""
    return media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.coalesce(F.col("meta.duration_ms"), F.lit(0)) - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ms"),
    )
