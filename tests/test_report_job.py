"""Report sink + spark-submit job script surfaces."""

import os
import sys

from pyspark.sql import functions as F

from mysql_log_parser_spark import synth
from mysql_log_parser_spark.pipeline import SlowLogPipeline
from mysql_log_parser_spark.report import digest_report


def test_digest_report(spark, tmp_path):
    p = str(tmp_path / "tokens.parquet")
    synth.generate_parquet(p, n_docs=10, events_per_doc=20, seed=3)
    ev = SlowLogPipeline(spark).events(spark.read.parquet(p))
    rep = digest_report(ev, elapsed_sec=1.5)
    assert rep.startswith("Events: 200, time: 1.500000 sec, rate: 133.333333")
    assert "1.00 pct query time" in rep
    assert "bucket  0:" in rep
    assert "Query ID " in rep and "fingerprint: " in rep
    # no rate limiting seen in the synth corpus -> no corrected line
    assert "Rate-limit corrected" not in rep


def test_digest_report_rate_corrected(spark, tmp_path):
    """When events carry Log_slow_rate_limit=N the report surfaces the
    pt-query-digest observed*N correction, globally and per class."""
    p = str(tmp_path / "tokens.parquet")
    synth.generate_parquet(p, n_docs=10, events_per_doc=20, seed=3)
    ev = SlowLogPipeline(spark).events(spark.read.parquet(p)).withColumn(
        "rate_limit", F.lit(100)
    )
    rep = digest_report(ev)
    assert "Rate-limit corrected events: 20000 (observed 200" in rep
    assert "(rate-limit corrected: " in rep  # per-class line


def test_digest_job_cli(spark, tmp_path):
    """Drive jobs/digest_job.py main() end-to-end (incremental mode)."""
    ind = tmp_path / "in"
    ind.mkdir()
    synth.generate_parquet(str(ind / "c0.parquet"), n_docs=4, events_per_doc=10, seed=9)
    out = str(tmp_path / "out")

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "jobs"))
    import digest_job

    digest_job.main(
        ["--input", str(ind), "--output", out, "--mode", "exact", "--incremental"]
    )
    cd = spark.read.parquet(f"{out}/class_digest")
    gd = spark.read.parquet(f"{out}/global_digest").first()
    assert gd.total_queries == 40
    assert cd.count() == gd.unique_queries


def test_spark_submit_py_files(tmp_path):
    """North-rule packaging contract: run the digest job through a REAL
    `spark-submit --py-files <pkg.zip>` subprocess — the package must be
    importable from the shipped zip alone (cwd is outside the repo)."""
    import shutil
    import subprocess

    from mysql_log_parser_spark.session import package_zip

    submit = shutil.which("spark-submit")
    if submit is None:
        import pytest

        pytest.skip("spark-submit not on PATH")

    ind = tmp_path / "in"
    ind.mkdir()
    synth.generate_parquet(str(ind / "c0.parquet"), n_docs=4, events_per_doc=10, seed=21)
    out = str(tmp_path / "out")
    job = os.path.join(os.path.dirname(__file__), "..", "jobs", "digest_job.py")

    # SPARK_GRAFT_CPUS deliberately DISAGREES with --master: the job must
    # inherit the submit's master, not rebuild one from the env default
    env = dict(os.environ, SPARK_GRAFT_CPUS="2", SPARK_DRIVER_MEMORY="2g")
    res = subprocess.run(
        [
            submit,
            "--master", "local[4]",
            "--py-files", package_zip(),
            job,
            "--input", str(ind),
            "--output", out,
            "--mode", "sketch",
            "--bench-json",
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert res.returncode == 0, res.stderr[-2000:]

    # --bench-json prints ONE parseable line with in-job timing, and the
    # job must inherit spark-submit's --master (NOT env SPARK_GRAFT_CPUS=4's
    # default path — both say 4 here, so assert the reported master string)
    import json

    lines = [l for l in res.stdout.strip().splitlines() if l.startswith("{")]
    assert lines, res.stdout[-2000:]
    leg = json.loads(lines[-1])
    assert leg["events"] == 40
    assert leg["elapsed_sec"] > 0
    assert leg["master"] == "local[4]"
    # observed metrics ride the digest write (no extra pass): totals must
    # agree with the digest, and no event may fall through fingerprinting
    assert leg["observed"]["events"] == 40
    assert leg["observed"]["empty_fingerprints"] == 0
    assert leg["observed"]["qt_sum"] > 0

    import duckdb

    gd = duckdb.sql(f"SELECT total_queries FROM read_parquet('{out}/global_digest/*.parquet')").fetchone()
    assert gd[0] == 40


def test_digest_job_raw_log_mode(spark, tmp_path):
    """--raw-log: point the CLI job at ONE raw slow-log file (the reference
    CLI's own input mode) and get the same digests."""
    log = tmp_path / "slow.log"
    parts = []
    for i in range(30):
        parts.append(
            f"# Time: 240101 10:{i % 60:02d}:00\n"
            f"# User@Host: u[u] @ h []\n"
            f"# Query_time: {i}.500000  Lock_time: 0.000000 Rows_sent: 1  Rows_examined: 2\n"
            f"SELECT c FROM t{i % 3} WHERE id={i};\n"
        )
    log.write_text("".join(parts))
    out = str(tmp_path / "out")

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "jobs"))
    import digest_job

    digest_job.main(
        ["--input", str(log), "--output", out, "--mode", "exact",
         "--raw-log", "--chunk-mb", "1", "--routed"]
    )
    gd = spark.read.parquet(f"{out}/global_digest").first()
    assert gd.total_queries == 30
    assert gd.unique_queries == 3
    # routed layout carries the file name as the source tag, not NULL
    routed = spark.read.parquet(f"{out}/routed")
    assert routed.where(F.col("source") == "slow.log").count() == 30
