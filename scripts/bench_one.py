#!/usr/bin/env python
"""Time individual bench keys in isolation (noop sink, same protocol
as bench.py) and report per-invocation Spark JOB COUNTS — the round-12
fixed-cost metric for the serial-job-bound keys (guide §1, §5).

Usage: python scripts/bench_one.py <key> [<key> ...] [--reps N]
Env:   SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS as in bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:]]
    reps = 3
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i : i + 2]
    keys = args
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from zed_spark.session import build_spark

    spark = build_spark(app_name="zed_spark_bench_one")

    import bench
    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    queries.update(bench._extra_queries())

    out = {}
    for name in keys:
        fn = queries[name]
        # warm-up (codegen + any memoized fixture setup)
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        samples = []
        jobs = None
        for r in range(reps):
            group = f"bench_one_{name}_{r}"
            spark.sparkContext.setJobGroup(group, name)
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(time.perf_counter() - t0)
            jobs = len(spark.sparkContext.statusTracker().getJobIdsForGroup(group))
            spark.sparkContext.setJobGroup(None, None)
        samples.sort()
        out[name] = {
            "median_sec": round(samples[len(samples) // 2], 4),
            "min_sec": round(samples[0], 4),
            "max_sec": round(samples[-1], 4),
            "jobs_per_invocation": jobs,
            "reps": reps,
        }
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
