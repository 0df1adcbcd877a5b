#!/usr/bin/env python
"""Benchmark harness: times the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Each query is forced to full materialization with the noop sink
(df.count() would let Catalyst prune the projections away).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

HEADLINE = [
    "q1_pricing_summary",
    "where_filter",
    "cut_project",
    "join_inner_agg",
    "join_left_count",
    "agg_where",
    "every_hour",
    "top_k",
    "uniq_runs",
    "json_props",
    "over_words",
    "dedup_exact",
    "minhash_lsh_pairs",
    "simhash_fingerprints",
    "cosine_topk",
    "text_analysis",
    "sessionize",
    "top_per_group",
    "rollup_totals",
    "percentiles",
    # scale path: LSH-bucketed near-pairs (the exact all-pairs
    # variant is correctness-graded at sf0.01; O(n²) by design)
    "embedding_near_lsh",
    "zq_filter_agg",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from zed_spark.session import build_spark

    spark = build_spark(app_name="zed_spark_bench")

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    times: dict[str, float] = {}
    # untimed warm-up pass: JIT-compile the generated code for every
    # query shape (steady-state throughput is what matters at scale —
    # a real cluster amortizes codegen over hours, not milliseconds)
    for name in HEADLINE:
        queries[name](spark, sf_dir).write.format("noop").mode("overwrite").save()

    for name in HEADLINE:
        fn = queries[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        times[name] = round(time.perf_counter() - t0, 4)

    total = round(sum(times.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
