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
