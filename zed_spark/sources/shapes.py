"""Shape-grouping for heterogeneous inputs — zed's core data model.

zed streams are sequences of values where EACH VALUE carries its own
type (reference: docs/formats/zng.md:12-17, SURVEY §1.1); records of
different shapes flow through one pipeline. A DataFrame has one
schema, so the engine's representation of a mixed stream is a
*shape-grouped* family of DataFrames (SURVEY §7.4.2):

    groups = shape_groups(spark, "mixed.ndjson")   # shape -> DataFrame
    fused  = fuse_shape_groups(groups)             # superset schema
    sample = sample_shapes(groups)                 # one exemplar/shape

Shape identity = the record's field-name sequence (order matters, as
in zed where field order is part of the type). Per-shape schemas are
inferred from an exemplar row.

Scale: the shape key is computed row-parallel (json_object_keys);
grouping is a filter per shape (one scan with N predicate branches,
or N scans when shapes are many — shape counts are small in
practice, zed's own fuse assumes so).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def shape_key(json_col) -> F.Column:
    """Shape identity of a JSON object: its field names in order."""
    return F.array_join(F.json_object_keys(json_col), ",")


def shape_groups(spark: SparkSession, path: str) -> dict[str, DataFrame]:
    """Read ndjson with mixed shapes → {shape: typed DataFrame}.

    Driver round-trips are batched (round-11): shape discovery and one
    exemplar per shape come from ONE aggregation (first() per group),
    and every shape's schema_of_json evaluates in ONE driver-local
    job — the per-shape loop ran 1 + 2·N_shapes jobs per call, pure
    scheduling latency since each touched only metadata-scale data."""
    from zed_spark.cache_scope import scoped_cache

    raw = spark.read.text(path).filter(F.trim("value") != "")
    keyed = raw.withColumn("__shape", shape_key(F.col("value")))
    # min(value) — not first(value): first() under parallel partial
    # aggregation is scan-order-nondeterministic, so inferred schemas
    # could vary run to run (round-11 ADVICE); min is a deterministic
    # pure function of the data
    exemplars = {
        r["__shape"]: r["__ex"]
        for r in keyed.groupBy("__shape")
        .agg(F.min("value").alias("__ex"))
        .collect()
    }
    shapes = sorted(exemplars)
    out: dict[str, DataFrame] = {}
    if not shapes:
        return out
    ddl_row = (
        spark.range(1)
        .select(
            *[
                F.schema_of_json(F.lit(exemplars[s])).alias(f"__s{i}")
                for i, s in enumerate(shapes)
            ]
        )
        .first()
    )
    # SINGLE-PASS parse (round-12): the cache holds PARSED structs, one
    # when-guarded from_json per shape in ONE projection — each row
    # evaluates exactly its own shape's parse (when() is lazy), so the
    # text is parsed once per cache lifetime instead of once per shape
    # branch per downstream action. Slot-owned: reading a different
    # mixed stream later drops this cache instead of leaking it.
    parsed = scoped_cache(
        keyed.select(
            "__shape",
            *[
                F.when(
                    F.col("__shape") == s,
                    F.from_json(F.col("value"), ddl_row[f"__s{i}"]),
                ).alias(f"__p{i}")
                for i, s in enumerate(shapes)
            ],
        ),
        "shapes.parsed",
    )
    for i, shape in enumerate(shapes):
        rows = parsed.filter(F.col("__shape") == shape)
        # schema_of_json alphabetizes fields; restore the shape's
        # appearance order (field order is part of the zed type)
        order = [c for c in shape.split(",") if c]
        out[shape] = rows.select(
            *[F.col(f"__p{i}.`{c}`").alias(c) for c in order]
        )
    return out


def fuse_shape_groups(groups: dict[str, DataFrame], unions: str = "tagged") -> DataFrame:
    """zed `fuse` over a mixed stream: all shapes conformed to the
    superset schema (metadata-only, SURVEY §2.3 fuse row).

    Irreconcilable column types form first-class tagged unions by
    default (round-3; matches the reference's union types); pass
    unions="string" for the explicit textual-collapse opt-out."""
    from zed_spark.operators.fuse import fuse_dataframes

    return fuse_dataframes(list(groups.values()), unions=unions)


def sample_shapes(groups: dict[str, DataFrame]) -> DataFrame:
    """zed `sample`: one exemplar per shape (any(this) by typeof)."""
    from zed_spark.operators.misc_ops import sample_op

    return sample_op(list(groups.values()))


def typeof_shapes(groups: dict[str, DataFrame]) -> dict[str, str]:
    """zed `typeof` per shape group: the zed-style type name."""
    from zed_spark.functions.introspect import zed_type_name

    return {shape: zed_type_name(df.schema) for shape, df in groups.items()}
