"""Resumable incremental processing with per-chunk lineage + metrics.

The reference's resume contract (EP2, SURVEY.md §3): the caller persists
`Event.Offset` and restarts the parser with Options.StartOffset
(/root/reference/log/parser/options.go:4, slow.go:46-49); a partial event at
the seek point is discarded.  At table scale the equivalent unit of progress
is an input *chunk* (a parquet file of the tokens table, or an Iceberg
snapshot id): the runner processes only chunks not yet committed to its
manifest, writes each chunk's output idempotently, and commits the manifest
entry last — so a crash anywhere re-processes at most the in-flight chunk
(exactly the reference's partial-event-discard semantics, one level up).

Intra-doc byte-offset resume is ALSO supported end-to-end via the parser's
`start_offset` column (tested against the reference's StartOffset goldens);
this module handles the chunk level above it.

Manifest: a JSON-lines file under <output>/_manifest/ — one record per
committed chunk with row counts, per-source routed counts (lineage), and
wall-time metrics.  Commit is atomic via write-temp + rename.
"""

from __future__ import annotations

import json
import os
import time
import uuid
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CheckpointedRunner:
    def __init__(self, spark: SparkSession, output_dir: str):
        self.spark = spark
        self.output_dir = output_dir
        self.manifest_dir = os.path.join(output_dir, "_manifest")
        os.makedirs(self.manifest_dir, exist_ok=True)

    # -- manifest -------------------------------------------------------------

    def committed_chunks(self) -> dict[str, dict]:
        out = {}
        for name in sorted(os.listdir(self.manifest_dir)):
            if name.endswith(".json"):
                with open(os.path.join(self.manifest_dir, name)) as f:
                    rec = json.load(f)
                out[rec["chunk"]] = rec
        return out

    def _commit(self, rec: dict) -> None:
        safe = rec["chunk"].replace("/", "_").replace("=", "_")
        tmp = os.path.join(self.manifest_dir, f".{safe}.{uuid.uuid4().hex}.tmp")
        dst = os.path.join(self.manifest_dir, f"{safe}.json")
        with open(tmp, "w") as f:
            json.dump(rec, f)
        os.replace(tmp, dst)  # atomic commit

    # -- incremental run ------------------------------------------------------

    def pending_chunks(self, input_dir: str) -> list[str]:
        chunks = sorted(
            n for n in os.listdir(input_dir)
            if n.endswith(".parquet") and not n.startswith(("_", "."))
        )
        done = self.committed_chunks()
        return [c for c in chunks if c not in done]

    def run_incremental(
        self,
        input_dir: str,
        process: Callable[[DataFrame], DataFrame],
        max_chunks: int | None = None,
    ) -> list[dict]:
        """Process uncommitted chunks of `input_dir` through `process`
        (docs df -> events df), appending each chunk's output under
        <output>/data/chunk=<name>/ and committing lineage last.

        Returns the manifest records written this run.
        """
        from pyspark.sql import Observation

        records = []
        for chunk in self.pending_chunks(input_dir)[: max_chunks or None]:
            t0 = time.perf_counter()
            docs = self.spark.read.parquet(os.path.join(input_dir, chunk))
            # metrics ride along with the write action (df.observe) — no
            # extra count jobs over the input or the pipeline
            in_obs = Observation(f"in_{chunk}")
            out_obs = Observation(f"out_{chunk}")
            docs = docs.observe(in_obs, F.count(F.lit(1)).alias("rows_in"))
            ev = process(docs).observe(
                out_obs, F.count(F.lit(1)).alias("events_out")
            )
            out_path = os.path.join(self.output_dir, "data", f"chunk={chunk}")
            # idempotent per-chunk write: a re-run of an uncommitted chunk
            # overwrites its own partial output
            ev.write.mode("overwrite").parquet(out_path)

            # per-partition lineage: row counts per routed source AND per
            # written output file, from one cheap read-back of this chunk
            done = self.spark.read.parquet(out_path)
            by_source = {
                r["source"]: r["cnt"]
                for r in done.groupBy("source").agg(F.count("*").alias("cnt")).collect()
            }
            by_file = {
                os.path.basename(r["f"]): r["cnt"]
                for r in done.groupBy(F.input_file_name().alias("f"))
                .agg(F.count("*").alias("cnt"))
                .collect()
            }
            rec = {
                "chunk": chunk,
                "rows_in": int(in_obs.get["rows_in"]),
                "events_out": int(out_obs.get["events_out"]),
                "by_source": by_source,
                "by_partition_file": by_file,
                "output_partitions": len(by_file),
                "wall_sec": round(time.perf_counter() - t0, 3),
                "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            }
            self._commit(rec)
            records.append(rec)
        return records

    def events(self) -> DataFrame:
        """All committed events (reads only committed chunk dirs)."""
        done = self.committed_chunks()
        paths = [
            os.path.join(self.output_dir, "data", f"chunk={c}") for c in done
        ]
        if not paths:
            raise ValueError("no committed chunks")
        return self.spark.read.parquet(*paths)
