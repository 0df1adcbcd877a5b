#!/usr/bin/env python
"""Dump .explain('formatted') for every bench/graded query into
plans/<tag>/<name>_<suffix>.txt (suffix = before|after). Plan-only:
queries whose *construction* runs driver jobs (query-vector lookup,
fixture setup) do run those, but nothing is timed here.

Usage: python scripts/dump_plans.py <tag> <suffix> [query ...]
"""

from __future__ import annotations

import os
import sys


sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    from zed_spark.session import build_spark

    spark = build_spark(app_name="zed_spark_plans")

    import bench
    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    queries.update(bench._extra_queries())
    names = bench.HEADLINE + bench.NEW_QUERIES
    # graded-only entries not in the bench battery still get plans
    names = names + [n for n in queries if n not in names]
    for name in names:
        if only and name not in only:
            continue
        try:
            df = queries[name](spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
            )
        except Exception as e:  # noqa: BLE001 — record the failure in place
            plan = f"ERROR building plan: {e!r}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(name, "ok" if not plan.startswith("ERROR") else "ERROR")


if __name__ == "__main__":
    main()
