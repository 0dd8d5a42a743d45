"""Scaling-efficiency evidence: identical CDC replay at N and 4N cores.

The BASELINE.json criterion (≥0.8 throughput scaling efficiency from N to 4N
executors) is evidenced in this sandbox by running the SAME replay job at two
local parallelism levels in separate JVMs (local[8] vs local[32] by default)
on the same WAL input, reporting throughput at both and
efficiency = (T_4N / T_N) / 4.

Usage: python scripts/bench_scaling.py [n_cores] [multiplier]
Prints one JSON line; also intended to be pasted into BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

RUNNER = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
from ethereum_etl_spark.session import get_spark
import bench
cpus = {cpus}
spark = get_spark("scale-%d" % cpus, master="local[%d]" % cpus, shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")
res = bench.run_replay(spark, wal_path={wal!r}, warehouse="/tmp/scale_wh_%d" % cpus)
print("RESULT:" + json.dumps(res))
"""


def run_at(cpus: int, repo: str, wal: str) -> dict:
    code = RUNNER.format(repo=repo, cpus=cpus, wal=wal)
    env = dict(os.environ)
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, env=env, timeout=3600
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT:"):
            return json.loads(line[7:])
    raise RuntimeError(f"no result at local[{cpus}]:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    blocks = os.environ.get("BENCH_BLOCKS", "4000")
    wal = f"/tmp/bench_wal_v2_b{blocks}"

    r_n = run_at(n, repo, wal)
    r_4n = run_at(n * mult, repo, wal)
    eff = (r_4n["events_per_sec"] / r_n["events_per_sec"]) / mult
    print(
        json.dumps(
            {
                "metric": "cdc_merge_replay_scaling_efficiency",
                "n_cores": n,
                "throughput_n": r_n["events_per_sec"],
                "n4_cores": n * mult,
                "throughput_4n": r_4n["events_per_sec"],
                "efficiency": round(eff, 3),
                "events": r_n["events"],
            }
        )
    )


if __name__ == "__main__":
    main()
