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


# Entries without a CURRENT-round driver CORRECTNESS row enumerate FIRST:
# the driver's per-round gate records the first ~50 queries() entries in
# dict order, so (a) never-gated, (b) changed-since-their-last-gate, and
# (c) r02-row-only entries must lead while the r03-green-and-untouched
# tail absorbs any cap (VERDICT r3 "What's missing" #1).
_VERIFY_FIRST = [
    # (a) new this round, never driver-gated
    "winnow_fingerprints",
    "winnow_dup_pairs",
    "mix_temperature",
    "incremental_lsh_dedup",
    "stream_lsh_dedup",
    "char_diversity",
    "dsir_weights",
    "quality_classifier",
    "ann_ivf_probe2",
    "slow_snapshot_range",
    "ann_ivfpq_adc",
    "ann_ivfpq_rerank",
    "ann_pq_recall",
    "bpe_train8",
    "source_overlap_sketch",
    "ngram_novelty_sketch",
    "dedup_substring",
    "bpe_apply",
    # (b) implementation changed after their last green driver row
    "ann_lsh_topk",          # r02 row; Arrow matmul kernel param added (VERDICT r3)
    "semantic_dedup",        # r03 row; centroid kernel='auto' switch added
    "heavy_hitters",         # r03 row; certification edge-case fix (ADVICE)
    "stream_heavy_hitters",  # r03 row; shares the certify helper
    "bpe_merge_step",        # r03 row; bpe.py generalized to N rounds
    "bpe_train2",            # r03 row; same
    "line_boilerplate",      # r03 row; integer-exact threshold (ADVICE)
    "slow_route_counts",     # r03 row; upsert key scoping + storage seam
    "minhash_lsh_pairs",     # r02 row; band_long extracted from lsh_candidate_pairs
    # (c) r02 rows only, implementation untouched since — rotate through
    "slow_rawlog_chunked",   # rawlog gzip/member streaming touched the module
    "slow_report_ladder",    # report.py rate-corrected lines touched the module
    "slow_window_agg",
    "slow_example_select",
    "slow_example_ts",
    "ngram_jaccard_pairs",
    "multimodal_features",
    "ann_ivf_topk",
    "slow_salted_class_agg",
    "slow_rollup_digest",
    "slow_bool_stats",
    "slow_resume_offset",
    "multimodal_frame_sample",
    "slow_sink_class_agg",
    "ann_kmeans_step",
    "slow_session_window",
    "slow_asof_config",
    "slow_range_bands",
    "slow_stats_pivot",
    "ann_kmeans_iter2",
    "slow_class_agg_sketch",
    "slow_spike_detect",
    "slow_distinct_sketch",
    "slow_global_sketch",
    "stream_route_counts",
    "stream_stateful_digest",
    "text_quality",
    "lang_id",
    "token_stats",
    "simhash_docs",
    "ann_cosine_topk",
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
