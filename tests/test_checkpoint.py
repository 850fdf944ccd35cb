"""Kill-and-resume semantics of the chunk-checkpointed runner, plus the
intra-doc byte-offset resume contract (Options.StartOffset equivalent)."""

import os

import pytest

from mysql_log_parser_spark import synth
from mysql_log_parser_spark.operators.checkpoint import CheckpointedRunner
from mysql_log_parser_spark.pipeline import SlowLogPipeline


@pytest.fixture()
def chunked_input(tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    for i in range(4):
        synth.generate_parquet(
            str(d / f"chunk{i}.parquet"), n_docs=6, events_per_doc=10, seed=100 + i
        )
    return str(d)


def test_incremental_resume(spark, chunked_input, tmp_path):
    out = str(tmp_path / "out")
    pipe = SlowLogPipeline(spark)
    runner = CheckpointedRunner(spark, out)

    # first run "crashes" after 2 chunks
    recs = runner.run_incremental(chunked_input, pipe.events, max_chunks=2)
    assert len(recs) == 2
    assert len(runner.committed_chunks()) == 2

    # resume: only the remaining chunks are processed
    recs2 = CheckpointedRunner(spark, out).run_incremental(chunked_input, pipe.events)
    assert len(recs2) == 2
    assert {r["chunk"] for r in recs} | {r["chunk"] for r in recs2} == {
        f"chunk{i}.parquet" for i in range(4)
    }

    # resumed output == from-scratch output
    resumed = runner.events().count()
    scratch = pipe.events(spark.read.parquet(*(f"{chunked_input}/chunk{i}.parquet" for i in range(4)))).count()
    assert resumed == scratch == 4 * 6 * 10

    # third run: nothing to do
    assert CheckpointedRunner(spark, out).run_incremental(chunked_input, pipe.events) == []

    # lineage present per chunk
    rec = runner.committed_chunks()["chunk0.parquet"]
    assert rec["rows_in"] == 6 and rec["events_out"] == 60
    assert sum(rec["by_source"].values()) == 60 and rec["wall_sec"] > 0
    # per-partition (output file) lineage sums to the chunk total
    assert sum(rec["by_partition_file"].values()) == 60
    assert rec["output_partitions"] == len(rec["by_partition_file"]) >= 1


def test_idempotent_reprocess_of_uncommitted(spark, chunked_input, tmp_path):
    """A chunk whose output was written but not committed is re-processed
    and overwritten without duplication (the partial-event-discard analogue)."""
    out = str(tmp_path / "out")
    pipe = SlowLogPipeline(spark)
    runner = CheckpointedRunner(spark, out)
    runner.run_incremental(chunked_input, pipe.events, max_chunks=1)
    # simulate crash-after-write-before-commit for chunk1
    docs = spark.read.parquet(os.path.join(chunked_input, "chunk1.parquet"))
    pipe.events(docs).limit(3).write.mode("overwrite").parquet(
        os.path.join(out, "data", "chunk=chunk1.parquet")
    )
    runner.run_incremental(chunked_input, pipe.events)
    assert runner.events().count() == 4 * 6 * 10  # no dupes, no loss
