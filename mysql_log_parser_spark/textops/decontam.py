"""Benchmark decontamination: flag training documents that overlap an
evaluation set by word n-grams — the standard pre-training hygiene pass
(GPT-3 appendix C / PaLM-style 5-to-13-gram overlap checks).

Scale shape: the probe set (benchmark n-grams) is SMALL and broadcast; the
corpus explodes into distinct n-grams (narrow, no pre-shuffle), hits come
from a broadcast hash join, and the per-doc count aggregates map-side
before one shuffle on doc_id.  The corpus is never self-joined and never
shuffled by gram — the only wide edge is keyed by doc_id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mysql_log_parser_spark.textops.dedup import word_shingles


def probe_ngrams(bench_docs: DataFrame, text_col: str = "text", n: int = 5) -> DataFrame:
    """Distinct word n-grams of the benchmark set -> one `gram` column.
    Call .distinct() output small enough to broadcast (benchmarks are tiny
    next to the corpus)."""
    return (
        bench_docs.select(F.explode(word_shingles(F.col(text_col), n)).alias("gram"))
        .distinct()
    )


def contamination_hits(
    docs: DataFrame,
    probes: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    probes_broadcastable: bool = True,
    prefilter_buckets: int = 1 << 20,
) -> DataFrame:
    """Per-doc count of probe n-grams present (distinct per doc) and a
    contaminated flag; docs with zero hits are preserved via left join.

    `probes_broadcastable` is an EXPLICIT size statement, not a guess:

    - True (benchmark-sized probe sets): one broadcast hash join on gram —
      the corpus is never shuffled by gram at all.
    - False (probe sets past executor broadcast budget, e.g. many benchmarks
      x many grams): a bloom-style prefilter then an exact shuffle join.
      The prefilter broadcasts only the probes' DISTINCT xxhash64 buckets
      mod `prefilter_buckets` (bounded at <= prefilter_buckets longs no
      matter how big the probe set is) and left-semi drops every corpus
      gram whose bucket holds no probe — expected pass-through rate
      ~min(1, |probe grams| / prefilter_buckets) of non-matching grams.
      Survivors go through a shuffle hash join pinned via hint (never an
      implicit broadcast of a side the caller declared too big).  Size
      prefilter_buckets ~8x the expected distinct probe grams; an undersized
      prefilter only costs selectivity, never correctness.
    """
    grams = docs.select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), n)).alias("gram")
    )
    if probes_broadcastable:
        matched = grams.join(F.broadcast(probes), "gram")
    else:
        bucket_of = lambda c: F.pmod(F.xxhash64(c), F.lit(prefilter_buckets))  # noqa: E731
        probe_buckets = probes.select(bucket_of(F.col("gram")).alias("_gb")).distinct()
        survivors = grams.join(
            F.broadcast(probe_buckets),
            bucket_of(F.col("gram")) == F.col("_gb"),
            "left_semi",
        )
        matched = survivors.join(probes.hint("shuffle_hash"), "gram")
    hits = matched.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_probe_hits"))
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_probe_hits", F.lit(0)).cast("long").alias("n_probe_hits"),
            (F.coalesce("n_probe_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )
