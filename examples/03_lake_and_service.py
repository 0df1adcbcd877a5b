"""The lake layer and the HTTP query service.

Run: python examples/03_lake_and_service.py [sf_dir]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import tempfile
import urllib.request

from pyspark.sql import functions as F

from zed_spark.service import QueryService
from zed_spark.session import build_spark
from zed_spark.sources.lake import Lake
from zed_spark.sources.readers import read_table

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = build_spark()

# --- lake: pools, commits, pruning, delete ---------------------------
lake = Lake(spark, tempfile.mkdtemp(prefix="zed_lake_"))
pool = lake.create_pool("events", key="ts")
pool.load(read_table(spark, sf, "events"), author="example", message="initial")
print("pool rows:", pool.scan().count())
print("range scan:", pool.scan_range("2024-01-05", "2024-01-06").count())
pool.delete_where(F.col("event_type") == "error", message="drop errors")
print("after delete:", pool.scan().count())
pool.meta_commits().show()

# --- service: POST /query --------------------------------------------
svc = QueryService(spark, sf_dir=sf, lake_root=lake.root)
port = svc.start()
req = urllib.request.Request(
    f"http://127.0.0.1:{port}/query",
    data=b"from events | count() by event_type | sort -r count",
    method="POST",
)
print("POST /query →")
print(urllib.request.urlopen(req).read().decode())
print("GET /pools →", json.loads(urllib.request.urlopen(f"http://127.0.0.1:{port}/pools").read()))
svc.stop()
