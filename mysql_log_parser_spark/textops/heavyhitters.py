"""Two-pass distributed heavy hitters over token arrays.

The exact top-K (explode -> groupBy -> TakeOrderedAndProject) shuffles one
row per DISTINCT token per map partition — vocab-bounded, which is fine for
byte-level tokens but not for a 10^8+-entry vocabulary at corpus scale.
This operator is the scale path beyond that:

pass 1  per-partition Misra-Gries summaries (mapInPandas, bounded k_counters
        entries of state per partition, Arrow-batched numpy inside — never
        a per-row Python loop).  MG guarantee: a token absent from a
        partition's summary has local count < N_p/(k+1); absent from EVERY
        summary implies global count < N/(k+1).  The union of summaries is
        therefore a SUPERSET of every token with frequency >= N/(k+1).
pass 2  exact re-count of the candidates only: broadcast the candidate set
        (<= partitions * k_counters rows) into the exploded tokens, so the
        shuffle carries candidate-bounded partials instead of the vocabulary.

The result is EXACT (hash-equal to the one-pass plan) whenever the true
top-K frequencies clear the N/(k+1) superset threshold; the operator checks
that on the 10-row result and raises loudly instead of silently returning a
possibly-incomplete table (same contract as the rawlog overlap guard,
sources/rawlog.py).

The reference has no sketch beyond GK quantiles (log/stats.go:65); this is a
north-star operator for the 100 TB vocab-audit path.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _mg_merge(acc: "pd.Series | None", batch: pd.Series, k: int) -> pd.Series:
    """Mergeable Misra-Gries step: combine exact batch counts into the
    summary, then if more than k entries survive, subtract the (k+1)-th
    largest weight from all and drop the non-positive (the standard
    mergeable-summaries decrement, error adds across merges)."""
    acc = batch if acc is None else acc.add(batch, fill_value=0)
    if len(acc) > k:
        kth = acc.nlargest(k + 1).iloc[-1]
        acc = acc - kth
        acc = acc[acc > 0]
    return acc


def mg_partition_summaries(tokens_df: DataFrame, k_counters: int) -> DataFrame:
    """tokens_df(tokens array<int32>) -> (token int, weight long): one
    Misra-Gries summary per input partition, <= k_counters rows each."""
    import numpy as np

    k = int(k_counters)

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: pd.Series | None = None
        for pdf in batches:
            if not len(pdf):
                continue
            flat = np.concatenate([np.asarray(a, dtype=np.int64) for a in pdf["tokens"]])
            if not len(flat):
                continue
            u, c = np.unique(flat, return_counts=True)
            acc = _mg_merge(acc, pd.Series(c, index=u), k)
        if acc is not None and len(acc):
            yield pd.DataFrame(
                {"token": acc.index.astype("int32"), "weight": acc.values.astype("int64")}
            )

    return tokens_df.select("tokens").mapInPandas(summarize, "token int, weight long")


def heavy_hitters_topk(
    tokens_df: DataFrame, k_counters: int = 64, topk: int = 10
) -> DataFrame:
    """Exact top-`topk` tokens via MG candidate generation + exact re-count.

    Raises RuntimeError if the MG superset guarantee cannot certify the
    result (top-K frequencies at or below N/(k_counters+1) — raise
    k_counters).  Returns (token int, n long, rank long)."""
    spark = tokens_df.sparkSession
    cands = mg_partition_summaries(tokens_df, k_counters).select("token").distinct()

    exploded = tokens_df.select(F.explode("tokens").alias("token"))
    counted = (
        exploded.join(F.broadcast(cands), "token")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    top = counted.orderBy(F.desc("n"), F.asc("token")).limit(topk)
    w = Window.orderBy(F.desc("n"), F.asc("token"))
    out = top.select(
        F.col("token").cast("int").alias("token"),
        "n",
        F.row_number().over(w).cast("long").alias("rank"),
    )

    # Certification: every token with freq >= N/(k+1) is in the candidate
    # set, so the exact top-K over candidates equals the global top-K iff
    # the K-th candidate count clears that threshold.  K+1 rows of driver
    # state; the corpus never leaves the executors.
    #
    # Fewer than topk result rows is NOT automatically a failure: a corpus
    # with fewer than topk distinct tokens yields an exact, complete result.
    # That case is certified by comparing against the exact distinct-token
    # count — a vocab-bounded fallback job that only ever runs in this
    # degenerate branch (at scale, with k_counters sized properly, the
    # result always has topk rows and the threshold certificate applies).
    total = tokens_df.select(F.sum(F.size("tokens")).alias("N")).first()["N"] or 0
    rows = out.orderBy("rank").collect()
    threshold = total / (k_counters + 1)
    if total and len(rows) == topk and rows[-1]["n"] <= threshold:
        raise RuntimeError(
            f"heavy_hitters_topk cannot certify top-{topk}: tail count "
            f"{rows[-1]['n']} vs N/(k+1) = {threshold:.1f}; "
            f"raise k_counters (got {k_counters})"
        )
    if total and len(rows) < topk:
        n_distinct = exploded.select(
            F.countDistinct("token").alias("d")
        ).first()["d"]
        if n_distinct != len(rows):
            raise RuntimeError(
                f"heavy_hitters_topk cannot certify top-{topk}: only "
                f"{len(rows)} candidate rows but {n_distinct} distinct "
                f"tokens; raise k_counters (got {k_counters})"
            )
    return spark.createDataFrame(rows, schema=out.schema)
