"""Scaling-efficiency protocol (BASELINE.json north_rule).

No real cluster exists in this sandbox, so N vs 4N executors is evidenced by
running the IDENTICAL job on the IDENTICAL prepared input at local[8] and
local[32] (separate JVMs) and reporting throughput at both plus

    efficiency = (events_per_sec@32 / events_per_sec@8) / 4

Target >= 0.8.  Results go to BENCH/BASELINE.md.  Usage:

    python bench_scaling.py [sf_dir] [replicate]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def run(cpus: int, sf_dir: str, replicate: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_REPLICATE=str(replicate),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=1800,
    )
    line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    replicate = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    r8 = run(8, sf_dir, replicate)
    r32 = run(32, sf_dir, replicate)
    eff = (r32["events_per_sec"] / r8["events_per_sec"]) / 4
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency_8_to_32",
                "value": round(eff, 3),
                "unit": "ratio",
                "events": r32["events"],
                "events_per_sec@8": r8["events_per_sec"],
                "events_per_sec@32": r32["events_per_sec"],
                "pipeline_sec@8": r8["value"],
                "pipeline_sec@32": r32["value"],
                "sf": sf_dir,
                "replicate": replicate,
            }
        )
    )


if __name__ == "__main__":
    main()
