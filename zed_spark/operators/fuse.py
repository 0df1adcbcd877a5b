"""fuse — unify heterogeneous shapes into one superset schema.

Reference: runtime/sam/op/fuse/fuse.go:22 buffers the entire input
(spilling to disk) to compute the union type, then rewrites every
record. In Spark the schema is metadata: fusing N DataFrames is a
recursive StructType merge (zed_spark.schema.merge_types) plus one
cast-projection per input and a unionByName — zero buffering, fully
distributed, which is why this design scales to 100 TB where the
reference's operator is a pipeline breaker.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from zed_spark.schema import conform, merge_schemas


def fuse_dataframes(dfs: list[DataFrame], unions: str = "string") -> DataFrame:
    """Fuse N shapes into one DataFrame with the merged schema.

    unions picks the representation for irreconcilable column types:
    "string" (default — textual collapse, warns UnionTypeDowngrade)
    or "tagged" — first-class zed-style union values as tagged
    structs (union.py: struct<tag:int, v0:T0, v1:T1, ...>), matching
    the reference's union types (complex.go:290-330) without type
    loss; dispatch with union_tag/union_value."""
    if not dfs:
        raise ValueError("fuse of zero inputs")
    target = merge_schemas([d.schema for d in dfs], unions)
    out = conform(dfs[0], target)
    for d in dfs[1:]:
        out = out.unionByName(conform(d, target))
    return out


def fuse(df: DataFrame) -> DataFrame:
    """Single-DataFrame fuse: the schema is already the merged one,
    but per-row PRESENCE must be erased — fuse rewrites every row to
    the fused type, so formerly-absent fields become present nulls
    (fuse.md; pinned by zio/csvio/ztests/null-nested: `fuse | -f csv`
    must see uniform records)."""
    if "__zed_missing" in df.columns:
        df = df.drop("__zed_missing")
    return df
