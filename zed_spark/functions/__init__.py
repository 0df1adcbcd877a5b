"""zed scalar function library (reference dispatch table:
runtime/sam/expr/function/function.go:28-169).

Everything is a Column->Column function built from native
pyspark.sql.functions (JVM-side, codegen) — Python UDFs appear only
where Spark has no primitive (IPv6 CIDR math); those are vectorized
pandas UDFs, never row-at-a-time.
"""

from zed_spark.functions.strings import rune_len, zjoin, zreplace, zsplit
from zed_spark.functions.ztime import bucket, strftime
from zed_spark.functions.ip import cidr_match, network_of
from zed_spark.functions.parse import grok, parse_uri
from zed_spark.functions.flatten import flatten_record, nest_dotted, unflatten
from zed_spark.functions.grep import grep
from zed_spark.functions.introspect import kind_of, typeof_col

__all__ = [
    "rune_len", "zsplit", "zjoin", "zreplace",
    "bucket", "strftime",
    "cidr_match", "network_of",
    "parse_uri", "grok",
    "flatten_record", "unflatten", "nest_dotted",
    "grep", "typeof_col", "kind_of",
]
