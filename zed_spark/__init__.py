"""zed_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of brimdata/zed (the "super-structured"
analytics engine), re-expressed Spark-first.

This is NOT a port of the reference's pull-based Go engine
(reference: /root/reference, go module github.com/brimdata/super).
Every operator is declared through the DataFrame / SQL API so Catalyst
and Tungsten choose the physical strategy (pushdown, partial aggs,
broadcast joins, whole-stage codegen, AQE).

Public surface:

    from zed_spark import ZedSession
    z = ZedSession.build()
    zf = z.from_parquet("lineitem.parquet")
    (zf.where("l_shipdate <= date '1998-09-02'")
       .summarize(by=["l_returnflag"], sum_qty=("sum", "l_quantity"))
       .sort("l_returnflag")
       .df)                     # -> pyspark DataFrame

Sub-packages:
    operators/  — zed pipeline operators (where, cut, put, sort, join,
                  summarize, fuse, over, switch, …) as DataFrame fns
    functions/  — zed scalar function library (math, strings, time,
                  ip, parse, flatten, grep, shaping casts)
    sources/    — readers (parquet/json/csv/zeek-tsv/line) + the lake
                  layer (pools as partitioned, sorted parquet + manifest)
    textops/    — large-scale training-data ops: dedup (exact, minhash
                  LSH, simhash, n-gram jaccard, embedding cosine),
                  ANN similarity search, language id, quality scoring,
                  token counting, fingerprinting, multimodal plumbing
    streaming/  — Structured Streaming wrappers for the event table
"""

from zed_spark.session import ZedSession
from zed_spark.zframe import ZFrame

__version__ = "0.1.0"

__all__ = ["ZedSession", "ZFrame", "__version__"]
