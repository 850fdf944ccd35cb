"""spark-submit entry point: the parser-cli equivalent as a cluster job.

    spark-submit --py-files $(python -c 'from mysql_log_parser_spark.session \
        import package_zip; print(package_zip())') \
      jobs/digest_job.py --input /path/tokens_parquet --output /path/out \
      [--mode sketch|exact] [--filter-admin Quit,Ping] [--routed] [--report]

Reads the tokens table, runs parse -> fingerprint -> enrich-ready events,
writes per-source routed events plus class/global digests, optionally prints
the text report.  All progress is chunk-resumable when --incremental is given
(input treated as a directory of chunk files; manifest under --output).
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument(
        "--raw-log",
        action="store_true",
        help="treat --input as a raw slow-log FILE or a DIRECTORY of rotated "
        "logs (the reference CLI's --log mode): parsed in parallel by byte "
        "ranges (sources/rawlog.py), events tagged per-file",
    )
    ap.add_argument("--chunk-mb", type=int, default=64, help="raw-log chunk size")
    ap.add_argument("--mode", default="sketch", choices=["sketch", "exact"])
    ap.add_argument("--filter-admin", default="")
    ap.add_argument("--routed", action="store_true")
    ap.add_argument("--report", action="store_true")
    ap.add_argument("--incremental", action="store_true")
    ap.add_argument(
        "--bench-json",
        action="store_true",
        help="print ONE JSON line {events, elapsed_sec, events_per_sec}: "
        "the flagship digest span timed inside the job after one warmup "
        "materialization (bench.py's warm protocol; JVM/session startup and "
        "per-worker warmup excluded) — bench_submit.py reads this",
    )
    args = ap.parse_args(argv)
    if args.raw_log and args.incremental:
        ap.error(
            "--raw-log and --incremental are mutually exclusive: chunk-"
            "manifest resume operates on a directory of chunk files; for a "
            "single raw file re-run --raw-log (byte ranges are recomputed)"
        )

    from pyspark.sql import SparkSession

    from mysql_log_parser_spark.operators.aggregate import class_digest, global_digest
    from mysql_log_parser_spark.operators.checkpoint import CheckpointedRunner
    from mysql_log_parser_spark.pipeline import SlowLogPipeline
    from mysql_log_parser_spark.session import build_session

    pre_existing = SparkSession.getActiveSession() is not None
    # Token docs expand ~20x through the parse (array<int32> -> event rows):
    # size input splits for the EXPANDED working set and keep parquet/Arrow
    # batches small on fat array rows (measured deltas in BENCH.md).  All
    # runtime-settable SQL confs, so they apply under spark-submit too.
    spark = build_session(
        app_name="mlp-digest-job",
        # don't retune a session some host process already owns
        extra_conf=None if pre_existing else {
            "spark.sql.files.maxPartitionBytes": "4m",
            "spark.sql.files.openCostInBytes": "4m",
            "spark.sql.parquet.columnarReaderBatchSize": "256",
            "spark.sql.execution.arrow.maxRecordsPerBatch": "512",
        },
    )
    admin_filter = tuple(x for x in args.filter_admin.split(",") if x)
    pipe = SlowLogPipeline(spark, admin_filter=admin_filter, mode=args.mode)

    t0 = time.perf_counter()
    if args.raw_log:
        from mysql_log_parser_spark.functions.fingerprint import with_fingerprint
        from mysql_log_parser_spark.operators.parse import promote_metrics
        from mysql_log_parser_spark.sources.rawlog import read_raw_slowlog

        ev = promote_metrics(
            with_fingerprint(
                read_raw_slowlog(
                    spark,
                    args.input,
                    chunk_bytes=args.chunk_mb << 20,
                    admin_filter=admin_filter,
                    # source=None (default): every event is tagged with its
                    # file's basename — for a single file that IS the file
                    # name, and for a directory of rotated logs each file
                    # keeps its own sink instead of collapsing to one
                )
            )
        )
        if args.routed:
            pipe.route(ev, f"{args.output}/routed")
            ev = spark.read.parquet(f"{args.output}/routed")
    elif args.incremental:
        runner = CheckpointedRunner(spark, args.output)
        runner.run_incremental(args.input, pipe.events)
        ev = runner.events()
    else:
        ev = pipe.events(spark.read.parquet(args.input))
        if args.routed:
            pipe.route(ev, f"{args.output}/routed")
            ev = spark.read.parquet(f"{args.output}/routed")

    # metrics ride the digest write itself (observe = map-side counters on
    # the existing action; no extra pass) — the north rule's "metrics
    # emitted" for plain batch runs; incremental runs get theirs from the
    # checkpoint manifest
    from mysql_log_parser_spark.operators.metrics import observe_events

    ev, obs = observe_events(ev)
    cd = class_digest(ev, mode=args.mode)
    bench_sec = None
    if args.bench_json:
        # Warm protocol, same as bench.py: one untimed materialization first
        # (per-Python-worker first-task page-fault/alloc penalty is 3-5x and
        # GROWS with worker count — measured cold, a 32-core run is slower
        # than an 8-core one), then time the flagship digest span alone.
        cd.write.format("noop").mode("overwrite").save()
        t1 = time.perf_counter()
        cd.write.mode("overwrite").parquet(f"{args.output}/class_digest")
        bench_sec = time.perf_counter() - t1
    else:
        cd.write.mode("overwrite").parquet(f"{args.output}/class_digest")
    global_digest(ev, mode=args.mode).write.mode("overwrite").parquet(
        f"{args.output}/global_digest"
    )
    elapsed = time.perf_counter() - t0

    if args.bench_json:
        import json

        # total event count comes from the one-row global digest just
        # written — no extra pass over the corpus
        total = (
            spark.read.parquet(f"{args.output}/global_digest")
            .select("total_queries")
            .first()[0]
        )
        print(
            json.dumps(
                {
                    "events": int(total),
                    "elapsed_sec": round(bench_sec, 3),
                    "job_total_sec": round(elapsed, 3),
                    "events_per_sec": round(total / bench_sec, 1),
                    "master": spark.sparkContext.master,
                    "parallelism": spark.sparkContext.defaultParallelism,
                    # observed during the digest write (no extra pass)
                    "observed": {k: v for k, v in obs.get.items()},
                }
            )
        )
    if args.report:
        from mysql_log_parser_spark.report import digest_report

        print(digest_report(ev, elapsed_sec=elapsed))
    if not pre_existing:
        spark.stop()


if __name__ == "__main__":
    sys.path.insert(0, ".")
    main()
