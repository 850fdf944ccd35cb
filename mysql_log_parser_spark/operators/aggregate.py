"""Per-class / global aggregates (the reference's EventStats/QueryClass/
GlobalClass model, /root/reference/log/stats.go + log/class.go), re-expressed
as Spark hash aggregations.

The reference accumulates per-metric {Cnt, Sum, Min, Avg, Pct95, Med, Max}
with these parity-relevant quirks:

- percentiles are exact, 0-indexed, integer-division rank, NO interpolation:
  Pct95 = sorted[(95*Cnt)/100], Med = sorted[(50*Cnt)/100]   (stats.go:126-128)
  (deliberately different from pt-query-digest, log_test.go:492-494)
- NumberStats Avg is integer division                         (stats.go:137)
- TimeMetrics are float32 at parse, accumulated as float64    (stats.go:70)
- Stddev is declared but never computed (always 0)            (stats.go:119-127)
- a GK(eps=0.01) sketch is kept alongside the exact values    (stats.go:24,65)

Two modes:

- mode="exact": reproduces the reference indexing bit-for-bit via
  element_at(array_sort(collect_list(v)), rank+1).  Unbounded per-group
  memory, exactly like the reference's vals buffer (stats.go:15) — use at
  test/golden scale only.
- mode="sketch": percentile_approx(v, phi, 100).  Spark's QuantileSummaries
  *is* Greenwald-Khanna; accuracy=100 == the reference's eps=0.01 sketch.
  Mergeable partial+final (map-side combine), bounded memory — the 10^12-row
  path.  No salting needed: Spark's partial aggregation already combines
  map-side per partition, so a hot class produces one partial sketch per
  map task, not a hot shuffle key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GK_ACCURACY = 100  # == 1/eps for the reference's gkquantile.NewGKSummary(0.01)


def _exact_rank(vals: Column, cnt: Column, pct: int) -> Column:
    """sorted[(pct*cnt)/100], 0-indexed (stats.go:126-128); element_at is 1-based."""
    idx = F.floor((F.lit(pct) * cnt) / 100).cast("int") + 1
    return F.element_at(vals, idx)


def _metric_stats(v: Column, mode: str, integer: bool) -> list[Column]:
    cnt = F.count(v)
    if mode == "exact":
        vals = F.array_sort(F.collect_list(v))
        p95 = _exact_rank(vals, cnt, 95)
        med = _exact_rank(vals, cnt, 50)
    else:
        # one GK sketch serving both quantiles: the two element_at refs share
        # a single percentile_approx aggregate (Catalyst dedups
        # semantically-equal aggregate functions), halving sketch count per
        # metric vs separate p50/p95 calls
        pa = F.percentile_approx(
            v, F.array(F.lit(0.5), F.lit(0.95)), F.lit(GK_ACCURACY)
        )
        p95 = F.element_at(pa, 2)
        med = F.element_at(pa, 1)
    if integer:
        s = F.sum(v)
        avg = F.floor(s / cnt).cast("long")  # integer division (stats.go:137)
    else:
        s = F.sum(v.cast("double"))
        avg = s / cnt
    # Stddev is declared but never computed in the reference (always 0,
    # stats.go:119-127); parity mode reproduces that, sketch mode computes it.
    sd = F.lit(0.0) if mode == "exact" else F.coalesce(F.stddev_pop(v), F.lit(0.0))
    return [cnt, s, F.min(v), avg, p95, med, F.max(v), sd]


_STAT_NAMES = ("cnt", "sum", "min", "avg", "pct95", "med", "max", "stddev")


def stats_long(events: DataFrame, group_cols: tuple[str, ...] = (), mode: str = "exact") -> DataFrame:
    """Long-form EventStats: one row per (group..., kind, metric).

    Mirrors EventStats' three dynamic maps (stats.go:8-12): the maps are
    exploded and aggregated per metric name, so open-ended metric vocabularies
    aggregate without schema changes.  Bool metrics get cnt/true_cnt
    (stats.go:39-42); their stat columns are null.
    """
    g = [F.col(c) for c in group_cols]

    t = events.select(*g, F.explode("time_metrics").alias("metric", "v"))
    t_agg = t.groupBy(*g, "metric").agg(
        *[c.alias(n) for c, n in zip(_metric_stats(F.col("v"), mode, False), _STAT_NAMES)]
    ).withColumn("kind", F.lit("time"))

    n = events.select(*g, F.explode("number_metrics").alias("metric", "v"))
    n_agg = n.groupBy(*g, "metric").agg(
        *[c.alias(n_) for c, n_ in zip(_metric_stats(F.col("v"), mode, True), _STAT_NAMES)]
    ).withColumn("kind", F.lit("number"))

    b = events.select(*g, F.explode("bool_metrics").alias("metric", "v"))
    b_agg = (
        b.groupBy(*g, "metric")
        .agg(
            F.count("v").alias("cnt"),
            F.sum(F.col("v").cast("int")).alias("true_cnt"),
        )
        .withColumn("kind", F.lit("bool"))
    )

    cols = [*group_cols, "kind", "metric", "cnt", *_STAT_NAMES[1:], "true_cnt"]
    t_agg = t_agg.withColumn("true_cnt", F.lit(None).cast("long"))
    n_agg = n_agg.withColumn("true_cnt", F.lit(None).cast("long"))
    for c in _STAT_NAMES[1:]:
        b_agg = b_agg.withColumn(c, F.lit(None).cast("double"))
    return (
        t_agg.select(*cols)
        .unionByName(n_agg.select(*cols))
        .unionByName(b_agg.select(*cols))
    )


def _promoted_stats(col: str, mode: str, integer: bool, prefix: str) -> list[Column]:
    v = F.col(col)
    return [
        c.alias(f"{prefix}_{n}")
        for c, n in zip(_metric_stats(v, mode, integer), _STAT_NAMES)
    ]


def class_digest(
    events: DataFrame,
    mode: str = "sketch",
    with_example: bool = True,
    group_extra: tuple[str, ...] = (),
) -> DataFrame:
    """Per-query-class digest — the QueryClass aggregation
    (class.go:70-121, bin/parser-cli.go:76-84).

    `events` must carry fingerprint/class_id (see with_fingerprint) and the
    promoted metric columns (see promote_metrics).  Groups by class_id
    (+ group_extra, e.g. ("source",) for per-sink digests) and emits
    total_queries plus Query_time / Lock_time / Rows_sent / Rows_examined
    stats and the argmax example (class.go:100-116).
    """
    keys = [*group_extra, "class_id"]
    aggs = [
        F.first("fingerprint").alias("fingerprint"),
        F.count(F.lit(1)).alias("total_queries"),
        *_promoted_stats("query_time", mode, False, "query_time"),
        *_promoted_stats("lock_time", mode, False, "lock_time"),
        *_promoted_stats("rows_sent", mode, True, "rows_sent"),
        *_promoted_stats("rows_examined", mode, True, "rows_examined"),
    ]
    if with_example:
        ex = F.max_by(F.struct("query", "ts"), F.col("query_time"))
        aggs += [
            F.max("query_time").alias("example_query_time"),
            ex["query"].alias("example_query"),
            # Go reformats the ts or blanks it on parse failure (class.go:106-110)
            F.coalesce(
                F.date_format(
                    F.try_to_timestamp(ex["ts"], F.lit("yyMMdd H:mm:ss")),
                    "yyyy-MM-dd HH:mm:ss",
                ),
                F.lit(""),
            ).alias("example_ts"),
        ]
    return events.groupBy(*keys).agg(*aggs)


def global_digest(events: DataFrame, mode: str = "sketch") -> DataFrame:
    """GlobalClass (class.go:12-64, bin/parser-cli.go:92-101): one row with
    TotalQueries, UniqueQueries (#classes), rate-limit consistency flag, and
    the same promoted metric stats over all events."""
    rate = F.when(F.col("rate_type") != "", F.struct("rate_type", "rate_limit"))
    return events.agg(
        F.count(F.lit(1)).alias("total_queries"),
        F.countDistinct("class_id").alias("unique_queries"),
        *_promoted_stats("query_time", mode, False, "query_time"),
        *_promoted_stats("rows_sent", mode, True, "rows_sent"),
        (F.countDistinct(rate) > 1).alias("mixed_rate_limits"),  # class.go:41-55
        F.max_by("rate_type", F.col("rate_type") != "").alias("rate_type"),
    )


def top_classes(digest: DataFrame, total_queries: int) -> DataFrame:
    """Report filter: classes with more than 10% of total traffic
    (bin/parser-cli.go:139)."""
    return digest.where(F.col("total_queries") > F.lit(total_queries) / 10)


def histogram(events: DataFrame, col: str = "query_time", buckets: int = 20) -> DataFrame:
    """Equi-width histogram over a metric (the GKq.Histo(20) report,
    bin/parser-cli.go:137) as a width_bucket-style aggregation."""
    v = F.col(col)
    bounds = events.agg(F.min(v).alias("_lo"), F.max(v).alias("_hi"))
    width = F.when(
        F.col("_hi") > F.col("_lo"), (F.col("_hi") - F.col("_lo")) / buckets
    ).otherwise(F.lit(1.0))
    b = F.least(F.floor((v - F.col("_lo")) / width).cast("int"), F.lit(buckets - 1))
    # broadcast the 1-row bounds instead of collecting them to the driver:
    # one job, no second full pass scheduled from a .first() round-trip
    return (
        events.crossJoin(F.broadcast(bounds))
        .groupBy(b.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("bucket")
    )


def salted_class_digest(
    events: DataFrame,
    salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation for hot query classes (the north-rule's
    explicit skew mitigation).

    Phase 1 aggregates per (class_id, salt) with salt = pmod(hash(doc_id,
    event_idx), salts), spreading a zipf-hot class over `salts` reducers;
    phase 2 merges the mergeable partials (cnt / sum / min / max — avg is
    derived).  Use when a single class dominates the corpus AND the final
    agg must carry non-mergeable state (exact-mode collect_list buffers);
    the sketch-mode digest does not need this because percentile_approx
    partials already combine map-side (one partial sketch per map task, not
    one shuffle row per event).
    """
    qt = F.col("query_time").cast("double")
    salt = F.pmod(F.hash("doc_id", "event_idx"), F.lit(salts))
    p1 = (
        events.withColumn("_salt", salt)
        .groupBy("class_id", "_salt")
        .agg(
            F.first("fingerprint").alias("fingerprint"),
            F.count(F.lit(1)).alias("cnt"),
            F.sum(qt).alias("qt_sum"),
            F.min(qt).alias("qt_min"),
            F.max(qt).alias("qt_max"),
            F.sum("rows_examined").alias("rex_sum"),
        )
    )
    return p1.groupBy("class_id").agg(
        F.first("fingerprint").alias("fingerprint"),
        F.sum("cnt").alias("total_queries"),
        F.sum("qt_sum").alias("qt_sum"),
        F.min("qt_min").alias("qt_min"),
        F.max("qt_max").alias("qt_max"),
        (F.sum("qt_sum") / F.sum("cnt")).alias("qt_avg"),
        F.sum("rex_sum").alias("rex_sum"),
    )


def partial_class_digest(
    events: DataFrame, shard_col: str | None = None
) -> DataFrame:
    """Mergeable per-class partial state — the unit a RESUMABLE digest
    persists per input chunk (CheckpointedRunner writes events per chunk;
    writing THIS instead lets a restart merge committed partials without
    ever re-reading their events).

    Every field is associatively mergeable (cnt/sum/min/max); derived stats
    (avg) are computed only after the merge, never stored.  With the
    corpus's fixed-point metric encoding (Query_time quantized to k/64) the
    float sums are exact in any grouping/merge order, so
    merge(partial(A) + partial(B)) == digest(A u B) bit-for-bit — the law
    test_merge_digest_law asserts and the slow_digest_merge oracle gates."""
    keys = ([shard_col] if shard_col else []) + ["class_id"]
    qt = F.col("query_time").cast("double")
    return events.groupBy(*keys).agg(
        F.first("fingerprint").alias("fingerprint"),
        F.count(F.lit(1)).alias("cnt"),
        F.sum(qt).alias("qt_sum"),
        F.min(qt).alias("qt_min"),
        F.max(qt).alias("qt_max"),
        F.sum("rows_sent").alias("rs_sum"),
        F.sum("rows_examined").alias("rex_sum"),
    )


def merge_class_digests(partials: DataFrame) -> DataFrame:
    """Merge any union of partial_class_digest outputs (across chunks,
    runs, or salt shards) into the combined per-class digest.  One keyed
    aggregation over CLASS-cardinality rows — the events are never touched
    again, which is what makes incremental/resumed aggregation O(classes)
    instead of O(events) on restart."""
    return partials.groupBy("class_id").agg(
        F.first("fingerprint").alias("fingerprint"),
        F.sum("cnt").alias("total_queries"),
        F.sum("qt_sum").alias("qt_sum"),
        F.min("qt_min").alias("qt_min"),
        F.max("qt_max").alias("qt_max"),
        (F.sum("qt_sum") / F.sum("cnt")).alias("qt_avg"),
        F.sum("rs_sum").alias("rs_sum"),
        F.sum("rex_sum").alias("rex_sum"),
    )


def rollup_digest(events: DataFrame, mode: str = "sketch") -> DataFrame:
    """Per-class AND global digest in ONE aggregation via rollup(class_id):
    Catalyst expands each input row into the (class_id) and () grouping sets
    inside the same shuffle, so the reference's two separate accumulator
    passes (QueryClass map + GlobalClass, bin/parser-cli.go:76-101) collapse
    into a single job: ONE scan/parse of the events, both result levels.
    (countDistinct adds one extra keyed exchange, but over already-reduced
    class-cardinality rows, not events.)

    The grand-total row has is_global = 1, class_id null, and
    unique_queries = number of distinct classes (class rows carry 1).
    """
    return events.rollup("class_id").agg(
        F.count(F.lit(1)).alias("total_queries"),
        F.countDistinct("class_id").alias("unique_queries"),
        *_promoted_stats("query_time", mode, False, "query_time"),
        *_promoted_stats("rows_examined", mode, True, "rows_examined"),
        F.grouping("class_id").cast("long").alias("is_global"),
    )
