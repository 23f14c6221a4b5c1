"""Structured Streaming: streaming results == batch results on the same
finite input; stateful dedup drops replays."""

from __future__ import annotations

import datetime
import os

import pytest
from pyspark.sql import functions as F

from pysql2neo4j_spark.schemas import TRANSCRIPT_SCHEMA
from pysql2neo4j_spark.streaming.ingest import (
    read_transcript_stream,
    run_to_completion,
    session_conversations,
    streaming_dedup_turns,
    tumbling_turn_counts,
)


@pytest.fixture()
def stream_dir(spark, corpus_pdf, tmp_out):
    pdf, _ = corpus_pdf
    src = os.path.join(tmp_out, "src")
    df = spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA)
    df.repartition(6).write.parquet(src)
    # sentinel row far in the future, written as a LATER file (the file
    # source orders batches by mtime): once all real rows are in, it
    # pushes the watermark past every real window so append mode emits
    # them. Were it in an early batch, real rows would arrive "late"
    # and be dropped.
    import time as _time

    _time.sleep(1.1)
    sentinel = spark.createDataFrame(
        [("zz-sentinel", 0, "user", "Thanks for the context.", None,
          datetime.datetime(2030, 1, 1))],
        schema=TRANSCRIPT_SCHEMA,
    )
    sentinel.coalesce(1).write.mode("append").parquet(src)
    return src


def test_tumbling_stream_equals_batch(spark, stream_dir):
    # all 6 real files in trigger 1, the sentinel file in trigger 2:
    # rows of one turn-window must not straddle triggers out of ts
    # order, or they are legitimately dropped as late (the corpus is
    # round-robin across files, not time-ordered).
    stream = read_transcript_stream(spark, stream_dir, max_files_per_trigger=6)
    got = run_to_completion(tumbling_turn_counts(stream), name="t_tumble")
    got = got.filter(F.col("window_start") < "2029-01-01")

    batch = (
        spark.read.schema(TRANSCRIPT_SCHEMA).parquet(stream_dir)
        .filter(F.col("conv_id") != "zz-sentinel")
        .groupBy(F.window("ts", "1 hour"), "role")
        .agg(F.count("*").alias("n_turns"))
        .select(F.col("window.start").alias("window_start"),
                F.col("window.end").alias("window_end"), "role", "n_turns")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))


def test_session_stream_runs(spark, stream_dir):
    stream = read_transcript_stream(spark, stream_dir)
    got = run_to_completion(session_conversations(stream), name="t_sess")
    rows = got.filter(F.col("conv_id") != "zz-sentinel").collect()
    assert rows
    # sessions cover each conversation's turn count exactly once in total
    per_conv = {}
    for r in rows:
        per_conv[r.conv_id] = per_conv.get(r.conv_id, 0) + r.n_turns
    batch = spark.read.schema(TRANSCRIPT_SCHEMA).parquet(stream_dir).filter(
        F.col("conv_id") != "zz-sentinel").groupBy("conv_id").count().collect()
    assert per_conv == {r.conv_id: r["count"] for r in batch}


def test_streaming_dedup_drops_replays(spark, corpus_pdf, tmp_out):
    pdf, _ = corpus_pdf
    src = os.path.join(tmp_out, "dup_src")
    df = spark.createDataFrame(pdf.head(200), schema=TRANSCRIPT_SCHEMA)
    # at-least-once source: every row delivered twice
    df.unionByName(df).repartition(4).write.parquet(src)
    stream = read_transcript_stream(spark, src)
    got = run_to_completion(streaming_dedup_turns(stream), name="t_dedup")
    assert got.count() == 200
    assert got.groupBy("conv_id", "turn_idx").count().filter("count>1").count() == 0


def test_interval_join_stream_equals_batch(spark, tmp_out):
    """VERDICT r3 #4: the watermarked stream-stream interval join must
    emit exactly the rows of its batch twin (entry_queries.
    stream_stream_join) on identical finite input. Inner join: matches
    emit when both rows have arrived; all real files go into one
    trigger so neither side's state is cleaned before its matches."""
    import os

    from pysql2neo4j_spark.entry_queries import QUERIES
    from pysql2neo4j_spark.streaming.ingest import (
        interval_join_clicks_purchases,
        read_event_stream,
    )

    sf_dir = "/root/testdata/sf0.001"
    src = os.path.join(tmp_out, "events_src")
    spark.read.parquet(os.path.join(sf_dir, "events.parquet")).repartition(4).write.parquet(src)
    # stream the same rows through the interval join
    stream = read_event_stream(spark, src, max_files_per_trigger=4)
    got = run_to_completion(
        interval_join_clicks_purchases(stream), name="t_ssj"
    ).withColumn("click_ts", F.col("click_ts").cast("timestamp_ntz")).withColumn(
        "purchase_ts", F.col("purchase_ts").cast("timestamp_ntz")
    )

    batch = QUERIES["stream_stream_join"](spark, sf_dir)
    cols = ["click_id", "purchase_id", "user_id", "click_ts", "purchase_ts",
            "purchase_value"]
    assert sorted(map(tuple, got.select(*cols).collect())) == sorted(
        map(tuple, batch.select(*cols).collect())
    )
    assert got.count() > 0  # non-vacuous


def test_interval_left_join_stream_equals_batch(spark, tmp_out):
    """LEFT OUTER stream-stream join: null-extended rows emit only when
    the watermark proves no matching purchase can still arrive, so the
    source gets far-future sentinel rows on BOTH sides (a click and a
    purchase) in a later file — they push the global watermark past
    every real click's horizon and the outer rows flush. Final row set
    must equal the batch left join."""
    import datetime
    import os
    import time as _time

    from pysql2neo4j_spark.entry_queries import QUERIES
    from pysql2neo4j_spark.streaming.ingest import (
        EVENT_SCHEMA,
        interval_join_clicks_purchases,
        read_event_stream,
    )

    sf_dir = "/root/testdata/sf0.001"
    src = os.path.join(tmp_out, "events_src")
    spark.read.parquet(os.path.join(sf_dir, "events.parquet")).repartition(4).write.parquet(src)
    _time.sleep(1.1)  # file source orders batches by mtime
    far = datetime.datetime(2030, 1, 1)
    sentinels = spark.createDataFrame(
        [
            (999_000_001, far, -1, "click", 0.0, None),
            (999_000_002, far, -2, "purchase", 0.0, None),
        ],
        schema=EVENT_SCHEMA,
    )
    sentinels.coalesce(1).write.mode("append").parquet(src)

    stream = read_event_stream(spark, src, max_files_per_trigger=4)
    got = (
        run_to_completion(
            interval_join_clicks_purchases(stream, how="leftOuter"), name="t_sslj"
        )
        .filter(F.col("user_id") >= 0)  # drop sentinel rows
        .withColumn("click_ts", F.col("click_ts").cast("timestamp_ntz"))
        .withColumn("purchase_ts", F.col("purchase_ts").cast("timestamp_ntz"))
    )
    batch = QUERIES["stream_stream_left_join"](spark, sf_dir)
    cols = ["click_id", "purchase_id", "user_id", "click_ts", "purchase_ts",
            "purchase_value"]
    got_rows = sorted(map(tuple, got.select(*cols).collect()))
    want_rows = sorted(map(tuple, batch.select(*cols).collect()))
    assert got_rows == want_rows
    # non-vacuous both ways: some matches AND some null-extended rows
    assert any(r[1] is not None for r in want_rows)
    assert any(r[1] is None for r in want_rows)
