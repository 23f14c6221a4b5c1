"""Custom stateful streaming operator via ``applyInPandasWithState``
(task mandate: "applyInPandasWithState for custom stateful operators").

``running_conversation_stats`` maintains per-conversation state (turn
count, max turn index, first/last event time) across micro-batches and
emits the updated row for every conversation touched by a batch —
the streaming analogue of ``groupBy(conv_id).agg(...)`` with
incremental, exactly-once state instead of a full re-aggregation.

Determinism contract (tests/test_streaming_stateful.py): whatever the
micro-batch slicing, the LAST emitted row per conversation equals the
batch aggregate over the same input — state is associative and
batch-boundary-free.

Scale notes: state lives in the executor state store keyed by
conv_id (RocksDB-backed on a real cluster), one Arrow crossing per
(group, batch); the input stream should be watermark-deduped
(streaming/ingest.streaming_dedup_turns) so at-least-once sources do
not inflate counts.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "conv_id STRING, n_turns LONG, max_turn INT, first_ts TIMESTAMP, last_ts TIMESTAMP"
)
STATE_SCHEMA = "n LONG, mx INT, first_ts TIMESTAMP, last_ts TIMESTAMP"


def _update(key, pdf_iter, state: GroupState):
    if state.exists:
        n, mx, first_ts, last_ts = state.get
    else:
        n, mx, first_ts, last_ts = 0, -1, None, None
    for pdf in pdf_iter:
        if len(pdf) == 0:
            continue
        n += len(pdf)
        mx = max(mx, int(pdf["turn_idx"].max()))
        lo, hi = pdf["ts"].min(), pdf["ts"].max()
        first_ts = lo if first_ts is None else min(first_ts, lo)
        last_ts = hi if last_ts is None else max(last_ts, hi)
    state.update((n, mx, first_ts, last_ts))
    yield pd.DataFrame(
        {
            "conv_id": [key[0]],
            "n_turns": [n],
            "max_turn": [mx],
            "first_ts": [first_ts],
            "last_ts": [last_ts],
        }
    )


def running_conversation_stats(stream: DataFrame) -> DataFrame:
    """Incremental per-conversation stats over a transcript stream.
    ``ts`` must be timezone-aware (cast in read_transcript_stream)."""
    return (
        stream.select("conv_id", "turn_idx", "ts")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
