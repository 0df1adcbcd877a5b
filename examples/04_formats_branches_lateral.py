"""Round-2 features: ZSON/ZJSON formats, lake branches, tagged
unions, and lateral over-expressions.

Run: python examples/04_formats_branches_lateral.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import tempfile

from pyspark.sql import functions as F

from zed_spark.operators.fuse import fuse_dataframes
from zed_spark.session import ZedSession, build_spark
from zed_spark.sources.lake import Lake
from zed_spark.sources.readers import read_table
from zed_spark.sources.zjson import read_zjson_fused, write_zjson
from zed_spark.sources.zson import read_zson_fused, write_zson

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = build_spark()
z = ZedSession(spark)

# --- ZSON / ZJSON round-trips (the zed migration on-ramp) ------------
nation = read_table(spark, sf, "nation")
d = tempfile.mkdtemp(prefix="zed_fmt_")
write_zson(nation, f"{d}/nation_zson", single_file=True)
write_zjson(nation, f"{d}/nation_zjson", single_file=True)
print("zson round-trip rows:", read_zson_fused(spark, f"{d}/nation_zson").count())
print("zjson round-trip rows:", read_zjson_fused(spark, f"{d}/nation_zjson").count())
# ZSON files work as language sources too
print(z.query(f"from {d}/nation_zson | count()").df.first()["count"], "via language")

# --- lake branches: stage → merge → revert ---------------------------
lake = Lake(spark, tempfile.mkdtemp(prefix="zed_lake_"))
pool = lake.create_pool("nation", key="n_nationkey")
pool.load(nation, message="base")
pool.create_branch("staging")
bad = pool.load(nation.limit(5), branch="staging", message="staged")
print("main:", pool.scan("main").count(), "staging:", pool.scan("staging").count())
pool.merge("staging", into="main", message="ship")
print("after merge:", pool.scan("main").count())
pool.revert(bad)  # oops — undo as a NEW commit
print("after revert:", pool.scan("main").count())
print(z.query("from nation:branches | cut branch, n_objects", lake=lake).df.collect())

# --- tagged unions: no silent type loss ------------------------------
a = spark.createDataFrame([(1, 42)], "id long, x long")
b = spark.createDataFrame([(2, "hello")], "id long, x string")
fused = fuse_dataframes([a, b], unions="tagged")
fused.show()

# --- lateral over-expressions ----------------------------------------
df = spark.createDataFrame([(1, [3, 1, 4, 1, 5])], "id long, nums array<long>")
out = z.query(
    "from t | put total := (over nums | sum(this)), "
    "evens := (over nums | where this % 2 == 0 | collect(this))",
    tables={"t": df},
).df
out.show(truncate=False)
