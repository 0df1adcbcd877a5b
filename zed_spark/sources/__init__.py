"""Sources & sinks: file readers (parquet/json/csv/zeek-tsv/line/
ZSON/ZJSON) and the lake layer (pools as partitioned sorted parquet
+ commit log with branches).

Reference: format dispatch zio/anyio/lookup.go:24-56; lake under
lake/ (pools, branches, commits). See readers.py, zson.py, zjson.py
and lake.py.
"""

from zed_spark.sources.readers import read_any, read_table, read_zeek_tsv
from zed_spark.sources.zjson import read_zjson, read_zjson_fused, write_zjson
from zed_spark.sources.zson import read_zson, read_zson_fused, write_zson

__all__ = [
    "read_any", "read_table", "read_zeek_tsv",
    "read_zson", "read_zson_fused", "write_zson",
    "read_zjson", "read_zjson_fused", "write_zjson",
]
