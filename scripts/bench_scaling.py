"""Scaling-efficiency evidence: identical CDC replay at multiple core counts.

The BASELINE.json criterion (≥0.8 throughput scaling efficiency from N to 4N
executors) is evidenced in this sandbox by running the SAME replay job at
several local parallelism levels in separate JVMs on the same WAL input.
Measurement protocol:
- warmup replay first (JIT + python-worker pools), then measure
- single whole-WAL batch (sustained-throughput shape; per-cycle latency
  chains are a local-mode artifact that a multi-executor cluster amortizes
  across hundreds of concurrent batches)
- report throughput per level + step efficiencies
  eff(N→M) = (T_M / T_N) / (M / N)

Usage: python scripts/bench_scaling.py [cores ...]   (default: 2 8 32)
Env: BENCH_BLOCKS (default 262144), SPARK_DRIVER_MEMORY.
Prints one JSON line (paste into BASELINE.md).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

RUNNER = r"""
import json, sys
sys.path.insert(0, {repo!r})
from ethereum_etl_spark.session import get_spark
import bench
bench.BENCH_BLOCKS = {blocks}
# 2x cores (measured: local[32] at 32 shuffle partitions leaves the
# concurrent per-entity merges straggler-bound — 33.2k events/s; at 64
# partitions the same replay does 65.9k. One task-wave per stage cannot
# overlap merges; two waves can.)
spark = get_spark("scale-{cpus}", master="local[{cpus}]", shuffle_partitions={sp})
spark.sparkContext.setLogLevel("ERROR")
res = bench.run_replay(spark, {wal!r}, "/tmp/scale_wh_{cpus}",
                       batch_seq={batch}, warmup=True)
print("RESULT:" + json.dumps(res))
"""


def run_at(cpus: int, repo: str, wal: str, blocks: int, batch: int) -> dict:
    code = RUNNER.format(
        repo=repo, cpus=cpus, sp=2 * cpus, wal=wal, blocks=blocks, batch=batch
    )
    env = dict(os.environ)
    # every level gets the SAME fixed heap (default 32g = 1 GiB/core at the
    # widest level — the realistic executor memory/core ratio). The whole-WAL
    # single batch peaks several localCheckpointed frames at once; an 8g heap
    # under 32 concurrent tasks GC-thrashes and drops checkpoint blocks,
    # which lineage truncation cannot recompute.
    env.setdefault("SPARK_DRIVER_MEMORY", "32g")
    out = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True, text=True, timeout=5400, env=env,
    )
    for line in out.stdout.splitlines():
        if line.startswith("RESULT:"):
            return json.loads(line[7:])
    raise RuntimeError(f"no result at local[{cpus}]:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")


def main():
    cores = [int(a) for a in sys.argv[1:]] or [2, 8, 32]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    blocks = int(os.environ.get("BENCH_BLOCKS", "262144"))
    wal = f"/tmp/bench_wal_v3_b{blocks}"  # v3: multi-family dex traffic + enriched-trade path
    batch = blocks * 16 + 1000  # single whole-WAL batch

    results = {}
    for c in cores:
        results[c] = run_at(c, repo, wal, blocks, batch)
        # incremental: a crash at a later level must not lose earlier ones
        print(f"LEVEL {c}: {json.dumps(results[c])}", file=sys.stderr, flush=True)

    levels = sorted(results)
    out = {
        "metric": "cdc_merge_replay_scaling",
        "events": results[levels[0]]["events"],
        "throughput": {str(c): results[c]["events_per_sec"] for c in levels},
        "step_efficiency": {},
    }
    for a, b in zip(levels, levels[1:]):
        eff = (results[b]["events_per_sec"] / results[a]["events_per_sec"]) / (b / a)
        out["step_efficiency"][f"{a}->{b}"] = round(eff, 3)
    if len(levels) >= 2:
        a, b = levels[0], levels[-1]
        out["overall_efficiency"] = round(
            (results[b]["events_per_sec"] / results[a]["events_per_sec"]) / (b / a), 3
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
