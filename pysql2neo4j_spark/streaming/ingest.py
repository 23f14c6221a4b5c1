"""Streaming ingest + windowed aggregation over the transcript/event
schemas.

Design: every streaming query here is the *same declarative plan* as a
batch counterpart in entry_queries.py (``stream_tumbling`` /
``stream_session``), so correctness is checked two ways:
  * batch mode vs the DuckDB oracle (driver gate);
  * streaming mode vs batch mode on identical input
    (tests/test_streaming.py) — the append-mode output after all
    watermarks close must equal the batch result.

At 10^12-turn scale the ingest source becomes Kafka/Iceberg CDC; the
plan (watermark -> window agg -> append sink) is unchanged — only
``readStream.format`` moves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..schemas import TRANSCRIPT_SCHEMA

# events star-table schema (streaming sources never infer)
EVENT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampNTZType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def read_transcript_stream(spark: SparkSession, path: str,
                           max_files_per_trigger: int = 8) -> DataFrame:
    """File-source streaming read of the transcript table (explicit
    schema — streaming sources never infer).

    ``ts`` is cast TIMESTAMP_NTZ -> TIMESTAMP: Spark's event-time
    watermarks only accept timezone-aware timestamps, and the session
    timezone is pinned UTC (session.py) so the instant is unchanged."""
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )


def tumbling_turn_counts(stream: DataFrame, window: str = "1 hour",
                         watermark: str = "10 minutes") -> DataFrame:
    """Watermarked tumbling-window turn counts per role."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "role")
        .agg(F.count("*").alias("n_turns"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "role",
            "n_turns",
        )
    )


def session_conversations(stream: DataFrame, gap: str = "30 minutes",
                          watermark: str = "1 hour") -> DataFrame:
    """Session windows per conv_id (gap-based) — conversation spans."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), "conv_id")
        .agg(F.count("*").alias("n_turns"), F.max("turn_idx").alias("max_turn"))
        .select(
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "conv_id",
            "n_turns",
            "max_turn",
        )
    )


def read_event_stream(spark: SparkSession, path: str,
                      max_files_per_trigger: int = 8) -> DataFrame:
    """File-source streaming read of the events table. ``ts`` cast
    NTZ -> timezone-aware for watermarks (session TZ pinned UTC)."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )


def interval_join_clicks_purchases(
    events: DataFrame, horizon: str = "30 minutes", watermark: str = "1 hour",
    how: str = "inner",
) -> DataFrame:
    """Watermarked STREAM-STREAM interval join (VERDICT r3 #4): each
    click matches the same user's purchases within
    [click_ts, click_ts + horizon]. Both sides carry a watermark and
    the join condition bounds event-time distance, so Spark can expire
    join state (a stream-stream join without both is unbounded state —
    the classic production OOM). Inner join: matches emit as soon as
    both rows arrive; the watermark governs state CLEANUP, not
    emission. ``how="leftOuter"``: unmatched clicks additionally emit
    null-extended rows, but only when the watermark proves no future
    purchase can still match (null emission IS state expiry — the part
    of outer stream-stream semantics that has no batch analogue in
    timing, though the final row set equals the batch left join). The
    batch twins are entry_queries.stream_stream_join /
    stream_stream_left_join (DuckDB-oracle-checked); tests assert
    stream == batch for both."""
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id").alias("click_user"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("purchase_user"),
            F.col("ts").alias("purchase_ts"),
            F.round("value", 2).alias("purchase_value"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    return clicks.join(
        purchases,
        F.expr(
            f"""click_user = purchase_user
                AND purchase_ts >= click_ts
                AND purchase_ts <= click_ts + INTERVAL {horizon}"""
        ),
        how,
    ).select(
        "click_id",
        "purchase_id",
        F.col("click_user").alias("user_id"),
        "click_ts",
        "purchase_ts",
        "purchase_value",
    )


def streaming_dedup_turns(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Stateful exactly-once turn dedup within the watermark: replays of
    (conv_id, turn_idx) from an at-least-once source are dropped — the
    streaming analogue of the reference's PK uniqueness constraint
    [recon: graphproc.py createConstraints]."""
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["conv_id", "turn_idx"]
    )


def run_to_completion(query_df: DataFrame, out_mode: str = "append",
                      name: str = "stream_out") -> DataFrame:
    """Drive a streaming DataFrame over a finite file source to
    completion via the memory sink; returns the materialized result as a
    batch DataFrame. Test/bench harness only — production uses a real
    sink with checkpointLocation."""
    import time

    spark = query_df.sparkSession
    q = (
        query_df.writeStream.outputMode(out_mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    try:
        q.processAllAvailable()
        # settle: the final watermark bump emits closed windows via a
        # no-data micro-batch that processAllAvailable does not always
        # wait for. A single fixed sleep is flaky on a loaded machine —
        # poll until the sink row count is stable across consecutive
        # processAllAvailable rounds (bounded retries).
        prev = -1
        for _ in range(20):
            cur = spark.sql(f"SELECT count(*) AS n FROM {name}").collect()[0].n
            if cur == prev:
                break
            prev = cur
            time.sleep(0.25)
            q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}")
