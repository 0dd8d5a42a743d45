"""Diagnose WHERE the 2->8 scaling loss in the whole-WAL replay comes from.

Runs the identical replay as bench_scaling at one core count with the Spark
UI enabled, then aggregates per-stage executor metrics from the REST API:
  busy  = sum(executorRunTime) / (wall * cores)   -- cores idle vs busy
  cpu   = sum(executorCpuTime) / sum(executorRunTime)
  gc    = sum(jvmGcTime) / sum(executorRunTime)
Idle cores (low busy) => scheduling/latency chains; busy-but-low-cpu =>
blocked on I/O / python; high cpu at 8 vs 2 cores with equal total work =>
memory-bandwidth stalls (stall cycles count as CPU time).

Usage: python scripts/diag_scaling.py <cores>
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    cpus = int(sys.argv[1])
    from ethereum_etl_spark.session import get_spark

    import bench

    blocks = int(os.environ.get("BENCH_BLOCKS", "262144"))
    bench.BENCH_BLOCKS = blocks
    spark = get_spark(
        f"diag-{cpus}", master=f"local[{cpus}]", shuffle_partitions=cpus,
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4055",
                    "spark.ui.retainedStages": "20000",
                    "spark.ui.retainedJobs": "20000"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    wal = f"/tmp/bench_wal_v3_b{blocks}"

    res = bench.run_replay(spark, wal, f"/tmp/diag_wh_{cpus}",
                           batch_seq=blocks * 16 + 1000, warmup=True)

    # first stage id AFTER warmup is unknown; instead take all stages and
    # subtract the warmup by completion time: record the wall window of the
    # measured replay (bench returns replay_sec; the measured replay ended
    # just now)
    t_end = time.time() * 1000
    t_start = t_end - res["replay_sec"] * 1000

    api = "http://localhost:4055/api/v1"
    apps = json.load(urllib.request.urlopen(f"{api}/applications"))
    app_id = apps[0]["id"]
    stages = json.load(
        urllib.request.urlopen(f"{api}/applications/{app_id}/stages?status=complete")
    )

    def ms(s, k):
        return s.get(k) or 0

    tot = {"runTime": 0, "cpuTime": 0, "gcTime": 0, "shuffleWriteTime": 0,
           "shuffleFetchWait": 0, "inputBytes": 0, "shuffleReadBytes": 0,
           "tasks": 0, "deserTime": 0, "resultSerTime": 0}
    n_in_window = 0
    rows = []
    for s in stages:
        # completionTime like '2026-08-19T12:34:56.789GMT'
        ct = s.get("completionTime")
        if not ct:
            continue
        t = time.mktime(time.strptime(ct[:19], "%Y-%m-%dT%H:%M:%S")) * 1000
        # REST times are GMT; time.mktime assumes local (UTC here) — container is UTC
        if t < t_start - 5000:
            continue  # warmup stage
        n_in_window += 1
        tot["runTime"] += ms(s, "executorRunTime")
        tot["cpuTime"] += ms(s, "executorCpuTime") / 1e6  # ns -> ms
        tot["gcTime"] += ms(s, "jvmGcTime")
        tot["shuffleWriteTime"] += ms(s, "shuffleWriteTime") / 1e6  # ns -> ms
        tot["shuffleFetchWait"] += ms(s, "shuffleFetchWaitTime")
        tot["inputBytes"] += ms(s, "inputBytes")
        tot["shuffleReadBytes"] += ms(s, "shuffleReadBytes")
        tot["tasks"] += ms(s, "numCompleteTasks")
        tot["deserTime"] += ms(s, "executorDeserializeTime")
        rows.append((ms(s, "executorRunTime"), s["stageId"], s["name"][:70],
                     ms(s, "numCompleteTasks"), ms(s, "inputBytes"),
                     ms(s, "shuffleReadBytes"),
                     (s.get("details") or "").split("\n")[0][:120]))

    wall_ms = res["replay_sec"] * 1000
    out = {
        "cores": cpus,
        "replay_sec": res["replay_sec"],
        "events_per_sec": res["events_per_sec"],
        "stages_in_window": n_in_window,
        "total_run_core_sec": round(tot["runTime"] / 1000, 1),
        "total_cpu_core_sec": round(tot["cpuTime"] / 1000, 1),
        "total_gc_core_sec": round(tot["gcTime"] / 1000, 1),
        "total_deser_core_sec": round(tot["deserTime"] / 1000, 1),
        "busy_fraction": round(tot["runTime"] / (wall_ms * cpus), 3),
        "cpu_over_run": round(tot["cpuTime"] / max(tot["runTime"], 1), 3),
        "gc_over_run": round(tot["gcTime"] / max(tot["runTime"], 1), 3),
        "shuffle_fetch_wait_core_sec": round(tot["shuffleFetchWait"] / 1000, 1),
        "input_gb": round(tot["inputBytes"] / 2**30, 2),
        "shuffle_read_gb": round(tot["shuffleReadBytes"] / 2**30, 2),
        "tasks": tot["tasks"],
    }
    print("DIAG:" + json.dumps(out))
    rows.sort(reverse=True)
    for rt, sid, name, nt, ib, srb, det in rows[:25]:
        print(f"  stage {sid:5d} run={rt/1000:8.1f}s tasks={nt:4d} in={ib/2**30:7.2f}G sh={srb/2**30:6.2f}G {name}")
    # the same stages re-ranked by input bytes — bandwidth attribution
    rows.sort(key=lambda r: r[4], reverse=True)
    print("  --- top by inputBytes ---")
    for rt, sid, name, nt, ib, srb, det in rows[:30]:
        print(f"  stage {sid:5d} in={ib/2**30:7.2f}G run={rt/1000:7.1f}s tasks={nt:4d} {name} | {det}")


if __name__ == "__main__":
    main()
