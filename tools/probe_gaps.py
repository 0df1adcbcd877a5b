"""Probe declared-gap ztests: which now pass under the harness?

Usage: python tools/probe_gaps.py [substring-filter]
Prints PASS / FAIL(reason) per skipped case so we can promote the
passers into the green battery and rank the rest by error distance.
"""
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

from zed_spark.session import build_spark  # noqa: E402

import test_ztests as tz  # noqa: E402


def main():
    filt = sys.argv[1] if len(sys.argv) > 1 else ""
    spark = build_spark(app_name="probe_gaps")
    passed, failed = [], []
    for path, reason in sorted(tz.UNSUPPORTED.items()):
        if filt and filt not in path and filt not in reason:
            continue
        if not os.path.exists(path):
            continue
        try:
            tz._run_case(spark, path)
            passed.append((path, reason))
            print(f"PASS {path}  [{reason}]", flush=True)
        except Exception as e:
            msg = str(e).replace("\n", " ")[:160]
            failed.append((path, reason, msg))
            print(f"FAIL {path}  [{reason}]  :: {type(e).__name__}: {msg}", flush=True)
    print(f"\n{len(passed)} now pass, {len(failed)} still fail")


if __name__ == "__main__":
    main()
