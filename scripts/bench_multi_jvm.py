"""Executor-shape scaling evidence: K concurrent local[C] JVMs on one box.

Separates ENGINE scaling from MACHINE scaling: four fully independent JVMs
(no shared driver, scheduler, GIL, or snapshot store) replaying the same WAL
into separate warehouses model 4 executors of C cores on one node. If their
aggregate throughput matches K x a lone local[C] run, the box scales and any
single-JVM falloff at K*C threads is an engine artifact; if the aggregate
falls short, the box itself saturates (memory bandwidth) and the single-JVM
local[K*C] number must be judged against THIS ceiling, not K*C/C.

Usage: python scripts/bench_multi_jvm.py [n_jvms] [cores_each]
Env: BENCH_BLOCKS (default 262144).
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

RUNNER = r"""
import json, sys
sys.path.insert(0, {repo!r})
from ethereum_etl_spark.session import get_spark
import bench
bench.BENCH_BLOCKS = {blocks}
spark = get_spark("mj{i}", master="local[{cores}]", shuffle_partitions={sp})
spark.sparkContext.setLogLevel("ERROR")
res = bench.run_replay(spark, {wal!r}, "/tmp/mj_wh_{i}",
                       batch_seq={batch}, warmup=True)
print("RESULT:" + json.dumps(res["events_per_sec"]))
"""


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    blocks = int(os.environ.get("BENCH_BLOCKS", "262144"))
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    wal = f"/tmp/bench_wal_v3_b{blocks}"  # v3: multi-family dex traffic + enriched-trade path
    batch = blocks * 16 + 1000

    t0 = time.time()
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", RUNNER.format(
                repo=repo, blocks=blocks, i=i, cores=cores, sp=2 * cores,
                wal=wal, batch=batch
            )],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        )
        for i in range(n)
    ]
    rates = []
    for p in procs:
        out, _ = p.communicate(timeout=5400)
        for line in out.splitlines():
            if line.startswith("RESULT:"):
                rates.append(json.loads(line[7:]))
    print(json.dumps({
        "metric": "cdc_merge_replay_multi_jvm",
        "n_jvms": n, "cores_each": cores,
        "per_jvm_events_per_sec": rates,
        "aggregate_events_per_sec": round(sum(rates), 1),
        "wall_sec": round(time.time() - t0, 1),
    }))


if __name__ == "__main__":
    main()
