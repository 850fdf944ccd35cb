"""Custom join operators Spark lacks natively.

As-of join (MERGE of a fact stream with the most recent dimension state at
each fact's timestamp) via the union-tag strategy: tag and union both
inputs, then one window pass per key carries the latest right-side values
forward onto left rows.  ONE shuffle on the join key, no broadcast, no
range-explosion — the scalable shape for slowly-changing config/dimension
state at 10^12 facts (a broadcast works only while the dim fits in memory;
an interval cross-join explodes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
) -> DataFrame:
    """For every left row, attach the `value_cols` of the latest right row
    with right_time <= left_time (per `on` key); nulls if none precedes.

    Ties (right_time == left_time): the right row applies (state effective
    AT its timestamp) — achieved by sorting right rows before left rows at
    equal times.
    """
    lt = F.col(left_time)
    l_tagged = left.withColumn("_t", lt).withColumn("_is_left", F.lit(1))
    for c in value_cols:
        l_tagged = l_tagged.withColumn(c, F.lit(None))
    r_tagged = (
        right.select(on, right_time, *value_cols)
        .withColumn("_t", F.col(right_time))
        .withColumn("_is_left", F.lit(0))
        .drop(right_time)
    )
    cols = [on, "_t", "_is_left", *value_cols]
    extra = [c for c in l_tagged.columns if c not in cols]
    unioned = l_tagged.select(*cols, *extra).unionByName(
        r_tagged.select(*cols, *[F.lit(None).alias(c) for c in extra])
    )
    w = (
        Window.partitionBy(on)
        .orderBy("_t", "_is_left")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        *[c for c in unioned.columns if c not in value_cols],
        *[F.last(c, ignorenulls=True).over(w).alias(c) for c in value_cols],
    )
    return filled.where(F.col("_is_left") == 1).drop("_t", "_is_left")


def range_join_broadcast(
    facts: DataFrame,
    bands: DataFrame,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
) -> DataFrame:
    """Join each fact to the band whose [lo, hi) interval contains its
    value.  Small band tables (the common case — SLA tiers, size classes)
    broadcast and the non-equi condition evaluates map-side
    (BroadcastNestedLoopJoin over a handful of rows per fact).

    Scale path for LARGE interval sets: don't range-join at all — sort the
    bounds once and bucketize with a binary search / width_bucket-style
    expression, turning the join into a narrow map (see
    aggregate.histogram for the equi-width special case)."""
    v = F.col(value_col)
    cond = (v >= F.col(lo_col)) & ((v < F.col(hi_col)) | F.col(hi_col).isNull())
    return facts.join(F.broadcast(bands), cond, "left")
