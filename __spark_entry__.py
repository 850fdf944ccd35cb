"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

The implementations live in mysql_log_parser_spark.entry_queries; each Spark
query runs the real pipeline (render corpus -> parse via mapInPandas ->
fingerprint via Catalyst regex chain -> aggregate), while the oracle derives
the expected result independently from the source columns.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mysql_log_parser_spark import entry_queries as EQ  # noqa: E402
from mysql_log_parser_spark.entry_queries_ext import EXT_QUERIES  # noqa: E402
from mysql_log_parser_spark.entry_queries_streaming import STREAMING_QUERIES  # noqa: E402
from mysql_log_parser_spark.entry_queries_textops import TEXTOPS_QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full parse->fingerprint->aggregate digest over a tokenized
    corpus derived from /root/testdata/sf0.001 (tokens path exercised)."""
    from pyspark.sql import functions as F

    from mysql_log_parser_spark.functions.fingerprint import with_fingerprint
    from mysql_log_parser_spark.operators.aggregate import class_digest
    from mysql_log_parser_spark.operators.parse import parse_slowlog, promote_metrics

    docs = EQ.docs_from_events(spark, "/root/testdata/sf0.001")
    tokens_tbl = docs.select(
        "doc_id", EQ.encode_tokens("text").alias("tokens"), "source"
    ).withColumn("n_tok", F.size("tokens"))

    ev = promote_metrics(with_fingerprint(parse_slowlog(tokens_tbl)))
    return class_digest(ev, mode="sketch")


# Entries without a driver-verified CORRECTNESS row yet enumerate FIRST:
# the driver's per-round gate records the first ~50 queries() entries in
# dict order, so never-verified and newest surfaces must lead while the
# long-green tail (r01/r02 rows on file) absorbs any cap.
_VERIFY_FIRST = [
    # never driver-gated through r02 (VERDICT r2 "What's missing" §1)
    "pii_redact",
    "repetition_stats",
    "decontaminate",
    "dedup_components",
    "mix_upsample",
    "token_budget",
    "vocab_stats",
    "curation_pipeline",
    "quality_filter",
    "pack_sequences",
    "sequence_pack",
    # new this round
    "decontaminate_shuffle",
    "slow_digest_merge",
    "slow_bucketed_join",
    "stream_dedup",
    "slow_checkpoint_resume",
    "semantic_dedup",  # re-gate: k now scales (32 cells) instead of fixed 4
    "token_id_topk",
    "token_bigram_topk",
    "heavy_hitters",
    "bpe_merge_step",
    "seq_len_histogram",
    "bpe_train2",
    "stream_heavy_hitters",
    "multimodal_resize",
    "line_boilerplate",
    "word_commonness",
    "slow_window_topk",
    "ngram_novelty",
    "source_overlap",
    "prefix_dup_groups",
    "slow_user_agg",
    "tokens_roundtrip",
    "slow_db_capture",
    "slow_set_skip",
    "slow_sliding_window",
    "slow_user_sketch",
    "slow_event_offsets",
    "slow_rate_corrected",
]


def _all_queries() -> dict:
    merged = dict(EQ.QUERIES)
    merged.update(EXT_QUERIES)
    merged.update(STREAMING_QUERIES)
    merged.update(TEXTOPS_QUERIES)
    out = {n: merged[n] for n in _VERIFY_FIRST if n in merged}
    out.update(merged)
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator surface (SURVEY.md §2 + the
    training-data ops: dedup / similarity / text analysis)."""
    return {name: fn for name, (fn, _) in _all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents (independent derivations).
    Queries without an entry here get the driver's weaker rows-only check."""
    return {name: sql for name, (_, sql) in _all_queries().items() if sql is not None}
