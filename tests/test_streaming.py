"""Structured Streaming parity: the streaming pipeline over progressively
arriving chunks must equal the batch pipeline over the union."""

import pytest
from pyspark.sql import functions as F

from mysql_log_parser_spark import synth
from mysql_log_parser_spark.pipeline import SlowLogPipeline
from mysql_log_parser_spark.streaming.pipeline import start_routed_sink, stream_events


def test_stream_matches_batch(spark, tmp_path):
    ind = tmp_path / "in"
    ind.mkdir()
    synth.generate_parquet(str(ind / "c0.parquet"), n_docs=5, events_per_doc=8, seed=1)
    synth.generate_parquet(str(ind / "c1.parquet"), n_docs=5, events_per_doc=8, seed=2)

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    ev = stream_events(spark, str(ind))
    q = start_routed_sink(ev, out, ckpt)
    q.awaitTermination(120)

    # second batch of files arrives; resume from streaming checkpoint
    synth.generate_parquet(str(ind / "c2.parquet"), n_docs=5, events_per_doc=8, seed=3)
    q = start_routed_sink(stream_events(spark, str(ind)), out, ckpt)
    q.awaitTermination(120)

    streamed = spark.read.parquet(out)
    batch = SlowLogPipeline(spark).events(spark.read.parquet(str(ind)))
    assert streamed.count() == batch.count() == 3 * 5 * 8

    s = {(r.source, r.class_id): r.cnt for r in
         streamed.groupBy("source", "class_id").agg(F.count("*").alias("cnt")).collect()}
    b = {(r.source, r.class_id): r.cnt for r in
         batch.groupBy("source", "class_id").agg(F.count("*").alias("cnt")).collect()}
    assert s == b


def test_windowed_counts_stream(spark, tmp_path):
    from mysql_log_parser_spark.streaming.pipeline import windowed_class_counts

    ind = tmp_path / "in"
    ind.mkdir()
    synth.generate_parquet(str(ind / "c0.parquet"), n_docs=4, events_per_doc=10, seed=5)

    agg = windowed_class_counts(stream_events(spark, str(ind)))
    q = (
        agg.writeStream.format("memory")
        .queryName("wincounts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select sum(total_queries) s from wincounts").first()
    assert rows.s == 4 * 10


def test_stateful_running_digest(spark, tmp_path):
    """applyInPandasWithState: per-class state must accumulate ACROSS
    micro-batches (after chunk 2, totals include chunk 1's events)."""
    from mysql_log_parser_spark.streaming.stateful import running_class_digest

    ind = tmp_path / "in"
    ind.mkdir()
    synth.generate_parquet(str(ind / "c0.parquet"), n_docs=4, events_per_doc=6, seed=7)

    q = (
        running_class_digest(stream_events(spark, str(ind)))
        .writeStream.format("memory")
        .queryName("running_digest")
        .outputMode("update")
        .start()
    )
    try:
        q.processAllAvailable()
        first = {
            r.class_id: r.total_queries
            for r in spark.sql("select * from running_digest").collect()
        }
        assert sum(first.values()) == 4 * 6

        # second chunk arrives mid-stream; keyed state carries over
        synth.generate_parquet(str(ind / "c1.parquet"), n_docs=4, events_per_doc=6, seed=8)
        q.processAllAvailable()
    finally:
        q.stop()

    # memory sink keeps every update row; the running total per class is the
    # max (counts are monotone)
    rows = spark.sql(
        "select class_id, max(total_queries) n from running_digest group by class_id"
    ).collect()
    got = {r.class_id: r.n for r in rows}
    assert sum(got.values()) == 2 * 4 * 6

    batch = SlowLogPipeline(spark).events(spark.read.parquet(str(ind)))
    want = {
        r.class_id: r.cnt
        for r in batch.groupBy("class_id").agg(F.count("*").alias("cnt")).collect()
    }
    assert got == want
