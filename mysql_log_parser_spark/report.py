"""Report sink: the reference CLI's stdout digest (bin/parser-cli.go:124-151)
re-expressed over the aggregate DataFrames.

Layout mirrored: events/rate line, a percentile ladder phi=0..1 step 0.05
from the GK sketch (percentile_approx == GKSummary), exact p95/med, a
20-bucket histogram, then a block per class holding >10% of traffic
(bin/parser-cli.go:139).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mysql_log_parser_spark.operators.aggregate import GK_ACCURACY

PHIS = [round(0.05 * i, 2) for i in range(21)]


def _ladder(events: DataFrame, col: str = "query_time") -> list[float]:
    row = events.agg(
        F.percentile_approx(F.col(col).cast("double"), PHIS, GK_ACCURACY).alias("l")
    ).first()
    return list(row.l) if row.l else []


def _histogram_lines(events: DataFrame, col: str = "query_time", buckets: int = 20) -> list[str]:
    from mysql_log_parser_spark.operators.aggregate import histogram

    rows = histogram(events, col, buckets).collect()
    total = sum(r.cnt for r in rows) or 1
    out = []
    for r in rows:
        bar = "#" * max(1, int(50 * r.cnt / total))
        out.append(f"  bucket {r.bucket:>2}: {r.cnt:>10}  {bar}")
    return out


def digest_report(
    events: DataFrame,
    elapsed_sec: float | None = None,
    top_fraction: float = 0.1,
) -> str:
    """Render the text digest for a parsed+fingerprinted+promoted events DF."""
    ev = events.persist()
    try:
        total = ev.count()
        # Sampling correction (pt-query-digest's observed*N math, surfaced
        # by the reference CLI's digest; ref bin/parser-cli.go:124-151):
        # each logged event stands for Log_slow_rate_limit actual sessions,
        # so corrected traffic = sum of per-event rate limits (0 = no rate
        # limiting seen = counts as itself).  Summing per event is exact
        # even when sinks carry different limits.
        rl = F.greatest(F.col("rate_limit"), F.lit(1)) if "rate_limit" in ev.columns else F.lit(1)
        corrected_total = ev.agg(F.sum(rl).cast("long").alias("c")).first()["c"] or 0
        lines = []
        if elapsed_sec:
            lines.append(
                f"Events: {total}, time: {elapsed_sec:.6f} sec, "
                f"rate: {total / elapsed_sec:.6f}"
            )
        else:
            lines.append(f"Events: {total}")
        if corrected_total != total:
            lines.append(
                f"Rate-limit corrected events: {corrected_total} "
                f"(observed {total}, server logged 1/N sessions)"
            )

        ladder = _ladder(ev)
        for phi, val in zip(PHIS, ladder):
            lines.append(f"{phi:.2f} pct query time : {val:.6f}")
        lines += _histogram_lines(ev)

        classes = (
            ev.groupBy("class_id")
            .agg(
                F.count(F.lit(1)).alias("total_queries"),
                F.sum(rl).cast("long").alias("corrected_queries"),
                F.first("fingerprint").alias("fingerprint"),
                F.percentile_approx(
                    F.col("query_time").cast("double"), PHIS, GK_ACCURACY
                ).alias("ladder"),
            )
            .where(F.col("total_queries") > total * top_fraction)
            .orderBy(F.desc("total_queries"))
            .collect()
        )
        for c in classes:
            if c.corrected_queries != c.total_queries:
                lines.append(
                    f"Query ID {c.class_id}, Events: {c.total_queries} "
                    f"(rate-limit corrected: {c.corrected_queries})"
                )
            else:
                lines.append(f"Query ID {c.class_id}, Events: {c.total_queries}")
            lines.append(f"  fingerprint: {c.fingerprint}")
            for phi, val in zip(PHIS, c.ladder or []):
                lines.append(f"  {phi:.2f} pct query time : {val:.6f}")
        return "\n".join(lines)
    finally:
        ev.unpersist()
