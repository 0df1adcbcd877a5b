"""Sweep reference ztest dirs through the tests/test_ztests.py harness
and bucket each case: PASS / MISMATCH / ERROR(kind). Triage tool, not a
test — run as `python tools/ztest_sweep.py <dir>...`.
"""

from __future__ import annotations

import glob
import os
import sys
import traceback

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")

DIRS = sys.argv[1:] or [
    "/root/reference/runtime/sam/expr/ztests",
    "/root/reference/runtime/sam/expr/function/ztests",
    "/root/reference/runtime/sam/expr/agg/ztests",
]


def main():
    from pyspark.sql import SparkSession

    import test_ztests as H

    from zed_spark.session import build_spark

    spark = build_spark(
        master="local[8]",
        extra_conf={"spark.sql.shuffle.partitions": "8"},
    )
    already = set()
    for c in H.CASES:
        already.add(c if c.startswith("/") else os.path.join(H.ZTESTS, c))

    results = {"PASS": [], "MISMATCH": [], "ERROR": []}
    for d in DIRS:
        for path in sorted(glob.glob(os.path.join(d, "*.yaml"))):
            if path in already:
                continue
            try:
                H._run_case(spark, path)
                results["PASS"].append(path)
                print(f"PASS {path}", flush=True)
            except AssertionError as e:
                results["MISMATCH"].append(path)
                first = str(e).split("\n")[0][:160]
                print(f"MISMATCH {path} :: {first}", flush=True)
            except Exception as e:
                results["ERROR"].append(path)
                print(f"ERROR {path} :: {type(e).__name__}: {str(e)[:160]}", flush=True)

    print("\n=== SUMMARY ===")
    for k, v in results.items():
        print(f"{k}: {len(v)}")


if __name__ == "__main__":
    main()
