"""Custom stateful streaming operator: running per-class digest.

The reference's aggregator goroutine keeps a live ``map[classId]*QueryClass``
that grows monotonically as events stream off the channel
(bin/parser-cli.go:72-88, class.go:96-117).  The Spark-native equivalent of
that *continuously updated* accumulator — as opposed to the per-window
aggregation in streaming/pipeline.py — is an ``applyInPandasWithState``
operator: explicit keyed state (cnt / sum / min / max of Query_time),
merged per micro-batch from Arrow-vectorized pandas slices, emitted in
`update` mode after every batch.

State is bounded: O(1) per query class, mergeable, survives restart via the
streaming checkpoint — exactly the contract of the reference's in-memory
class map plus durability it never had.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "class_id string, total_queries long, qt_sum double, qt_min double, qt_max double"
)
STATE_SCHEMA = "cnt long, qt_sum double, qt_min double, qt_max double"


def _update(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    cnt, qsum, qmin, qmax = (
        state.get if state.exists else (0, 0.0, float("inf"), float("-inf"))
    )
    for pdf in pdfs:
        qt = pd.to_numeric(pdf["query_time"], errors="coerce").fillna(0.0)
        if len(qt):
            cnt += int(len(qt))
            qsum += float(qt.sum())
            qmin = min(qmin, float(qt.min()))
            qmax = max(qmax, float(qt.max()))
    state.update((cnt, qsum, qmin, qmax))
    yield pd.DataFrame(
        {
            "class_id": [key[0]],
            "total_queries": [cnt],
            "qt_sum": [qsum],
            "qt_min": [qmin],
            "qt_max": [qmax],
        }
    )


def running_class_digest(events: DataFrame) -> DataFrame:
    """Streaming events -> continuously updated per-class digest.

    `events` is the (streaming) output of parse_slowlog + promote_metrics;
    only (class_id, query_time) are consumed, so Catalyst prunes the rest
    before the state exchange.
    """
    return (
        events.select("class_id", "query_time")
        .groupBy("class_id")
        .applyInPandasWithState(
            _update,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


MG_OUTPUT_SCHEMA = "source string, n_seen long, tokens array<int>, weights array<long>"
MG_STATE_SCHEMA = "n_seen long, tokens array<int>, weights array<long>"


def running_source_token_mg(tokens_stream: DataFrame, k_counters: int) -> DataFrame:
    """Streaming per-source Misra-Gries summary over `tokens` arrays —
    bounded O(k) keyed state per source, merged per micro-batch with the
    SAME mergeable step the batch operator uses
    (textops/heavyhitters._mg_merge), emitted in update mode with a
    monotone `n_seen` so the final summary per source is selectable with
    max_by.

    The summary is a certified candidate SUPERSET for heavy tokens (every
    token with per-source frequency >= N_src/(k+1) survives any merge
    order); an exact re-count downstream turns it into an exact top-K —
    the streaming half of the two-pass heavy-hitters design."""
    k = int(k_counters)

    def _upd(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        from mysql_log_parser_spark.textops.heavyhitters import _mg_merge

        if state.exists:
            n_seen, toks, wts = state.get
            acc = (
                pd.Series(
                    np.asarray(wts, dtype=np.int64),
                    index=np.asarray(toks, dtype=np.int64),
                )
                if len(toks)
                else None
            )
        else:
            n_seen, acc = 0, None
        for pdf in pdfs:
            n_seen += int(len(pdf))
            arrs = [np.asarray(a, dtype=np.int64) for a in pdf["tokens"]]
            arrs = [a for a in arrs if len(a)]
            if not arrs:
                continue
            u, c = np.unique(np.concatenate(arrs), return_counts=True)
            acc = _mg_merge(acc, pd.Series(c, index=u), k)
        toks = [] if acc is None else [int(t) for t in acc.index]
        wts = [] if acc is None else [int(w) for w in acc.values]
        state.update((n_seen, toks, wts))
        yield pd.DataFrame(
            {
                "source": [key[0]],
                "n_seen": [n_seen],
                "tokens": [toks],
                "weights": [wts],
            }
        )

    return (
        tokens_stream.select("source", "tokens")
        .groupBy("source")
        .applyInPandasWithState(
            _upd,
            MG_OUTPUT_SCHEMA,
            MG_STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )
