"""Extra benchmarks for optimization work (bench.py is FROZEN for the
driver's measurement — this file is where iteration happens).

Usage:
  python bench_extra.py q36_minhash_lsh_fast lsh_xxhash64_fast [--reps 2]
  python bench_extra.py --plans q36_minhash_lsh_fast   # dump explain() only

Each named query is run with the noop sink (guide §1.4) after one warm-up
pass at sf0.001, and timed individually; prints one JSON line. Accepts the
same env contract as bench.py ($SPARK_GRAFT_SF_DIR, $SPARK_GRAFT_CPUS).

`lsh_xxhash64_fast` is the same xxhash64 MinHash configuration bench.py
times (not a registry query).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _lsh_xxhash(spark, sf_dir):
    from ethereum_etl_spark.operators.dedup import minhash_lsh_pairs

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return minhash_lsh_pairs(docs, num_hashes=16, bands=4, hash_fn="xxhash64", max_bucket=64)


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 1
    if "--reps" in sys.argv:
        reps = int(sys.argv[sys.argv.index("--reps") + 1])
        args.remove(str(reps))
    plans_dir = None
    for a in sys.argv[1:]:
        if a.startswith("--plans-dir="):
            plans_dir = a.split("=", 1)[1]

    from ethereum_etl_spark.plans.harness_queries import QUERIES
    from ethereum_etl_spark.session import get_spark

    spark = get_spark("bench_extra", master=f"local[{cpus}]", shuffle_partitions=2 * cpus)
    spark.sparkContext.setLogLevel("ERROR")

    def build(name, d):
        if name == "lsh_xxhash64_fast":
            return _lsh_xxhash(spark, d)
        return QUERIES[name](spark, d)

    if plans_dir:
        os.makedirs(plans_dir, exist_ok=True)
        suffix = os.environ.get("PLAN_SUFFIX", "after")
        for name in args:
            df = build(name, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
            with open(os.path.join(plans_dir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(plan)
            print(f"wrote {name}_{suffix}.txt")
        return

    warm_dir = "/root/testdata/sf0.001"
    out = {}
    for name in args:
        if os.path.isdir(warm_dir):
            build(name, warm_dir).write.mode("overwrite").format("noop").save()
        samples = []
        for _ in range(reps):
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.time()
            build(name, sf_dir).write.mode("overwrite").format("noop").save()
            samples.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
        out[name] = min(samples)
        out[name + "__samples"] = samples
    print(json.dumps({"sf_dir": sf_dir, "cpus": cpus, "times": out}))


if __name__ == "__main__":
    main()
