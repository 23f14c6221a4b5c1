"""applyInPandasWithState operator: the last update per conversation
must equal the batch aggregate regardless of micro-batch slicing."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from pysql2neo4j_spark.streaming.ingest import read_transcript_stream
from pysql2neo4j_spark.streaming.stateful import running_conversation_stats


def test_stateful_running_stats_equals_batch(spark, transcripts_df, tmp_out):
    src = os.path.join(tmp_out, "src")
    transcripts_df.repartition(5).write.parquet(src)

    stream = read_transcript_stream(spark, src, max_files_per_trigger=2)
    q = (
        running_conversation_stats(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("conv_stats")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # update mode re-emits a conversation every time a batch touches it;
    # the final state per conversation is the row with the max n_turns
    got = {
        r.conv_id: (r.n_turns, r.max_turn, r.first_ts, r.last_ts)
        for r in spark.sql(
            """SELECT * FROM (
                 SELECT *, row_number() OVER (PARTITION BY conv_id
                                              ORDER BY n_turns DESC) AS rn
                 FROM conv_stats) WHERE rn = 1"""
        ).collect()
    }
    want = {
        r.conv_id: (r.n_turns, r.max_turn, r.first_ts, r.last_ts)
        for r in transcripts_df.withColumn("ts", F.col("ts").cast("timestamp"))
        .groupBy("conv_id")
        .agg(
            F.count("*").alias("n_turns"),
            F.max("turn_idx").alias("max_turn"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
        .collect()
    }
    assert got == want
