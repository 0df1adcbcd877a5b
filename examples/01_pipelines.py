"""Pipeline basics: the fluent API and the zed language side by side.

Run: python examples/01_pipelines.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from zed_spark import ZedSession

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
z = ZedSession.build()

# --- fluent API -------------------------------------------------------
print("== revenue by return flag (fluent) ==")
(
    z.table(sf, "lineitem")
    .where("l_shipdate <= date '1998-09-02'")
    .put(revenue=F.col("l_extendedprice") * (1 - F.col("l_discount")))
    .summarize(by=["l_returnflag"], total=("sum", "revenue"), n=("count", None))
    .sort("l_returnflag")
    .show()
)

# --- the zed language -------------------------------------------------
print("== same thing, zed text ==")
z.query(
    "from lineitem | l_shipdate <= 1998-09-02 "
    "| revenue := l_extendedprice * (1 - l_discount) "
    "| total:=sum(revenue), n:=count() by l_returnflag | sort l_returnflag",
    sf_dir=sf,
).show()

print("== switch routing + user functions ==")
z.query(
    "func tier(v): (v >= 150 ? 'high' : v >= 50 ? 'mid' : 'low') "
    "from events | put t := tier(value) | count() by t | sort -r count",
    sf_dir=sf,
).show()

print("== join with a subquery leg ==")
z.query(
    "from lineitem | join (from orders) on l_orderkey=o_orderkey "
    "priority:=o_orderpriority | count() by priority | sort priority",
    sf_dir=sf,
).show()
