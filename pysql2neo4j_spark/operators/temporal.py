"""Temporal joins — as-of join (the canonical "operator Spark lacks",
task mandate): for every left row, attach the most recent right row of
the same key with right_ts <= left_ts.

Spark-first implementation: NOT a theta/range join (which explodes to
|L|x|R| per key before filtering) but the union + ordered-window
last-non-null pattern:

    union(left tagged side=1, right tagged side=0)
      -> window over (key) ordered by (ts, side)
      -> last(right_value, ignorenulls=True) over rows unbounded
         preceding .. current row
      -> keep side=1 rows

ONE shuffle on the key, one sort, streaming frame (rows-between with a
current-row upper bound never buffers a partition) — survives any
scale where a per-key sort does, and skewed keys spill in the sort,
not in an aggregation buffer. ``side`` orders right rows BEFORE left
rows at equal timestamps, giving the standard inclusive (<=) as-of
semantics that DuckDB's ASOF JOIN implements.

Right rows must be unique per (key, ts) for the result to be
well-defined (same requirement DuckDB's ASOF has for determinism);
callers dedupe with an explicit rule first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """Left as-of join. Returns every ``left`` row plus, for each column
    of ``right`` other than (by, right_ts), the value from the latest
    right row with ``right_ts <= left_ts`` (NULLs when none exists —
    LEFT semantics). The matched right timestamp is exposed as
    ``asof_ts``."""
    val_cols = [c for c in right.columns if c not in (by, right_ts)]
    clash = sorted(set(val_cols) & set(left.columns))
    if clash:
        # the final select emits *left.columns then aliases each right
        # value column back to its bare name — a shared name would
        # produce duplicate/ambiguous output columns (ADVICE r2)
        raise ValueError(
            f"asof_join: right value column(s) {clash} collide with left "
            "columns; rename them on the right side before joining"
        )
    if "asof_ts" in left.columns:
        raise ValueError("asof_join: left already has an 'asof_ts' column")

    l_tag = left.withColumn("__ts", F.col(left_ts)).withColumn("__side", F.lit(1))
    for c in val_cols:
        l_tag = l_tag.withColumn(f"__r_{c}", F.lit(None).cast(right.schema[c].dataType))
    l_tag = l_tag.withColumn("__r_ts", F.lit(None).cast(right.schema[right_ts].dataType))

    r_tag = right.select(
        F.col(by),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.col(right_ts).alias("__r_ts"),
        *[F.col(c).alias(f"__r_{c}") for c in val_cols],
    )
    for c in left.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    u = l_tag.unionByName(r_tag.select(*l_tag.columns))
    w = (
        Window.partitionBy(by)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = u.select(
        *left.columns,
        F.col("__side"),
        F.last("__r_ts", ignorenulls=True).over(w).alias("asof_ts"),
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(c)
            for c in val_cols
        ],
    )
    return out.filter(F.col("__side") == 1).drop("__side")


def _epoch(col, dt) -> object:
    """Numeric ordering key for a ts column (ANSI forbids ntz->long
    directly: go ntz -> timestamp -> long; numerics pass through)."""
    from pyspark.sql import types as T

    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return col.cast("timestamp").cast("long")
    if isinstance(dt, T.DateType):
        return col.cast("timestamp").cast("long")
    return col.cast("long")


def asof_join_bucketed(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    bucket_seconds: int = 86400,
) -> DataFrame:
    """As-of join for HOT keys (VERDICT r2 #4): same semantics and
    output as ``asof_join``, but the per-key window is split into
    (key, time-bucket) partitions with boundary carry-over, so one key
    holding 30% of all events never serializes into a single sort task
    — each task sorts at most one bucket's rows.

    Carry-over: a left row's match may live in an EARLIER bucket, so
    every (key, bucket) the left touches is opened with the latest
    right row from any prior bucket. That opening state is itself an
    as-of at BUCKET granularity — per (key, bucket) last right rows
    unioned with the left's needed buckets through one ordered window
    PER KEY, but over bucket-level rows only (#buckets per key, bounded
    by time-range/bucket_seconds, not by data volume).

    Choose ``bucket_seconds`` so a hot key's densest bucket fits a
    task's sort budget; cold keys just see a few extra tiny partitions.
    """
    val_cols = [c for c in right.columns if c not in (by, right_ts)]
    clash = sorted(set(val_cols) & set(left.columns))
    if clash:
        raise ValueError(
            f"asof_join_bucketed: right value column(s) {clash} collide with "
            "left columns; rename them on the right side before joining"
        )
    if "asof_ts" in left.columns:
        raise ValueError("asof_join_bucketed: left already has an 'asof_ts' column")

    r_dt = right.schema[right_ts].dataType
    l_dt = left.schema[left_ts].dataType
    rstruct = F.struct(
        F.col(right_ts).alias("__r_ts"), *[F.col(c).alias(c) for c in val_cols]
    )
    rb = right.select(
        F.col(by),
        _epoch(F.col(right_ts), r_dt).alias("__ts"),
        F.floor(_epoch(F.col(right_ts), r_dt) / bucket_seconds).alias("__b"),
        rstruct.alias("__rs"),
    )

    # per-(key, bucket) LAST right row — window partitions are bucket-
    # bounded; deterministic tiebreak comes from the caller's per-(key,
    # ts) dedup contract (same as asof_join)
    w_last = Window.partitionBy(by, "__b").orderBy(F.desc("__ts"))
    summ = (
        rb.withColumn("__rn", F.row_number().over(w_last))
        .filter(F.col("__rn") == 1)
        .select(by, "__b", "__rs")
    )

    lb = left.withColumn("__ts", _epoch(F.col(left_ts), l_dt)).withColumn(
        "__b", F.floor(F.col("__ts") / bucket_seconds)
    )
    needed = lb.select(by, "__b").distinct()

    # bucket-granular carry: for each needed bucket, the last right
    # summary from any STRICTLY earlier bucket (side -1 sorts needed
    # rows before same-bucket summaries)
    u_carry = summ.select(by, "__b", F.lit(0).alias("__side"), "__rs").unionByName(
        needed.select(
            by, "__b", F.lit(-1).alias("__side"), F.lit(None).cast(summ.schema["__rs"].dataType).alias("__rs")
        )
    )
    w_carry = (
        Window.partitionBy(by)
        .orderBy("__b", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carry = (
        u_carry.withColumn("__c", F.last("__rs", ignorenulls=True).over(w_carry))
        .filter((F.col("__side") == -1) & F.col("__c").isNotNull())
        .select(
            by,
            "__b",
            (F.col("__b") * bucket_seconds).alias("__ts"),
            F.lit(-1).alias("__side"),
            F.col("__c").alias("__rs"),
        )
    )

    l_tag = lb.select(
        *left.columns, "__b", "__ts", F.lit(1).alias("__side"),
        F.lit(None).cast(summ.schema["__rs"].dataType).alias("__rs"),
    )
    # right/carry rows carry null left columns to align the union schema
    r_tag = rb.select(
        F.col(by), "__b", "__ts", F.lit(0).alias("__side"), "__rs",
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c != by],
    )
    c_tag = carry.select(
        F.col(by), "__b", "__ts", "__side", "__rs",
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c != by],
    )
    u = l_tag.select(*r_tag.columns).unionByName(r_tag).unionByName(c_tag)

    w = (
        Window.partitionBy(by, "__b")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    picked = F.last("__rs", ignorenulls=True).over(w)
    out = u.select(
        *left.columns,
        F.col("__side"),
        picked.getField("__r_ts").alias("asof_ts"),
        *[picked.getField(c).alias(c) for c in val_cols],
    )
    return out.filter(F.col("__side") == 1).drop("__side")
