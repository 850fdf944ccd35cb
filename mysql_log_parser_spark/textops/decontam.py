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
) -> DataFrame:
    """Per-doc count of probe n-grams present (distinct per doc) and a
    contaminated flag; docs with zero hits are preserved via left join."""
    grams = docs.select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), n)).alias("gram")
    )
    hits = (
        grams.join(F.broadcast(probes), "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_probe_hits"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_probe_hits", F.lit(0)).cast("long").alias("n_probe_hits"),
            (F.coalesce("n_probe_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )
