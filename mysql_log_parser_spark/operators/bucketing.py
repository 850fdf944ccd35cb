"""Bucketed (co-located) joins: pay the shuffle ONCE at write time, never
again at read time.

The reference is a single-process pipeline with no notion of data layout;
at 10^12 rows the dominant cost of every class-keyed join/aggregate is the
exchange.  Writing the events table bucketed by class_id (hash-partitioned
files + per-file sort) makes every subsequent join or aggregation on
class_id exchange-free: Spark's scan reports the bucket partitioning, so
SortMergeJoin consumes both sides in place and a following groupBy on the
same key needs no shuffle either.  This is the standing-table counterpart
of the one-shot `repartition(class_id)` the pipeline does in memory.

Requirements for the exchange-free plan (asserted in tests/test_plans.py):
same bucket count on both sides, join keys == bucket keys, and
`spark.sql.sources.bucketing.enabled` (default true).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    bucket_cols: tuple[str, ...] = ("class_id",),
    n_buckets: int = 8,
    sort_cols: tuple[str, ...] | None = None,
) -> str:
    """Write `df` as an external bucketed table (explicit `path`, so no
    dependency on a writable warehouse dir) registered as `name` in the
    session catalog.  Returns the table name for spark.table(name)."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.option("path", path).saveAsTable(name)
    return name


def colocated_join(
    spark: SparkSession,
    left_name: str,
    right_name: str,
    on: list[str],
    pin_sort_merge: bool = True,
) -> DataFrame:
    """Join two same-bucket-count tables on their bucket keys with ZERO
    exchanges: sort-merge consumes each bucket pair in place.

    `pin_sort_merge` (default) hints SMJ explicitly — the co-located layout
    exists for two LARGE sides, and without the hint Catalyst broadcasts a
    small side (a BroadcastExchange, fine at test scale but precisely the
    plan that stops working when both sides are 10^12-row tables).  Keep
    any downstream aggregation keyed on the same columns to stay
    exchange-free end-to-end.  Pass False to let Catalyst choose freely."""
    left, right = spark.table(left_name), spark.table(right_name)
    if pin_sort_merge:
        left, right = left.hint("merge"), right.hint("merge")
    return left.join(right, on)
