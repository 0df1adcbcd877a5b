"""Triage reference ztest yamls: run each through the pytest harness
machinery and bucket pass / fail / error, printing a summary that
guides battery expansion (VERDICT r02 item 2).

Usage: python scripts/ztest_triage.py [dir ...]
"""
import glob
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

DIRS = sys.argv[1:] or [
    "/root/reference/runtime/sam/expr/ztests",
    "/root/reference/runtime/sam/expr/function/ztests",
    "/root/reference/runtime/sam/expr/agg/ztests",
]


def main():
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .appName("ztest-triage")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import test_ztests as tz

    ok, bad = [], []
    for d in DIRS:
        for path in sorted(glob.glob(os.path.join(d, "*.yaml"))):
            try:
                tz._run_case(spark, path)
                ok.append(path)
                print(f"PASS {path}", flush=True)
            except Exception as e:
                msg = traceback.format_exception_only(type(e), e)[-1].strip()
                bad.append((path, msg[:200]))
                print(f"FAIL {path}: {msg[:160]}", flush=True)
    print(f"\n=== {len(ok)} pass / {len(bad)} fail ===")
    with open("/tmp/ztest_pass.txt", "w") as f:
        f.write("\n".join(ok))
    with open("/tmp/ztest_fail.txt", "w") as f:
        f.write("\n".join(f"{p}\t{m}" for p, m in bad))


if __name__ == "__main__":
    main()
