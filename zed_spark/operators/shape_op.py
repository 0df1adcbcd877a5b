"""Shaping operators: cast / crop / fill / order / shape / fit.

Reference: runtime/sam/expr/shaper.go:19-43 — composable bit-flag
transforms: cast (deep type cast), crop (drop fields not in target),
fill (null-fill missing fields), order (reorder to target), with
fit = crop|fill and shape = cast|fill|order. docs/language/shaping.md.

Spark-first: each is a recursive StructType-driven projection —
pure metadata planning, executed inside codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _project(
    col: Column,
    src: T.DataType,
    dst: T.DataType,
    *,
    cast: bool,
    crop: bool,
    fill: bool,
    order: bool,
) -> Column:
    if isinstance(dst, T.NullType):
        # the null type matches any source: shaping against it is the
        # identity (shaper.go null-type rule; ztest shape-fill-null)
        return col
    from zed_spark.schema import is_union_type

    if is_union_type(src):
        # union source: shape each member, first non-null wins (the
        # reference shapes each value by its runtime type)
        parts = [
            _project(
                col.getField(f.name), f.dataType, dst,
                cast=cast, crop=crop, fill=fill, order=order,
            )
            for f in src.fields[1:]
        ]
        return F.coalesce(*parts)
    if isinstance(src, T.StructType) and isinstance(dst, T.StructType):
        src_map = {f.name: f for f in src.fields}
        dst_map = {f.name: f for f in dst.fields}
        parts: list[Column] = []
        # choose field order: target order if ordering, else source order
        if order:
            names = [f.name for f in dst.fields if fill or f.name in src_map]
            extras = [] if crop else [f.name for f in src.fields if f.name not in dst_map]
            names += extras
        else:
            names = [f.name for f in src.fields if not crop or f.name in dst_map]
            if fill:
                names += [f.name for f in dst.fields if f.name not in src_map]
        for name in names:
            if name in src_map and name in dst_map:
                parts.append(
                    _project(
                        col.getField(name),
                        src_map[name].dataType,
                        dst_map[name].dataType,
                        cast=cast, crop=crop, fill=fill, order=order,
                    ).alias(name)
                )
            elif name in src_map:
                parts.append(col.getField(name).alias(name))
            else:  # fill
                parts.append(F.lit(None).cast(dst_map[name].dataType).alias(name))
        return F.when(col.isNull(), F.lit(None)).otherwise(F.struct(*parts))
    if isinstance(src, T.ArrayType) and isinstance(dst, T.ArrayType):
        return F.transform(
            col,
            lambda x: _project(x, src.elementType, dst.elementType,
                               cast=cast, crop=crop, fill=fill, order=order),
        )
    if cast and src != dst:
        return col.cast(dst)
    return col


def _apply(df: DataFrame, target: T.StructType, **flags) -> DataFrame:
    src = df.schema
    row = F.struct(*[F.col(c) for c in df.columns])
    shaped = _project(row, src, target, **flags)
    # materialize the row struct back to top-level columns
    out_type = df.select(shaped.alias("__r")).schema[0].dataType
    assert isinstance(out_type, T.StructType)
    return df.select(shaped.alias("__r")).select("__r.*")


def cast_to(df: DataFrame, target: T.StructType) -> DataFrame:
    return _apply(df, target, cast=True, crop=False, fill=False, order=False)


def crop_to(df: DataFrame, target: T.StructType) -> DataFrame:
    return _apply(df, target, cast=False, crop=True, fill=False, order=False)


def fill_to(df: DataFrame, target: T.StructType) -> DataFrame:
    return _apply(df, target, cast=False, crop=False, fill=True, order=False)


def order_to(df: DataFrame, target: T.StructType) -> DataFrame:
    return _apply(df, target, cast=False, crop=False, fill=False, order=True)


def fit_to(df: DataFrame, target: T.StructType) -> DataFrame:
    """fit = crop | fill (shaper.go:37)."""
    return _apply(df, target, cast=False, crop=True, fill=True, order=False)


def shape_to(df: DataFrame, target: T.StructType) -> DataFrame:
    """shape = cast | fill | order (shaper.go:40)."""
    return _apply(df, target, cast=True, crop=False, fill=True, order=True)
