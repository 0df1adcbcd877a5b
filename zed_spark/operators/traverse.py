"""over / explode — lateral iteration over complex values.

Reference:
  over    — runtime/sam/op/traverse/over.go:24 (+ scope.go: lateral
            subqueries with `with var=` bindings): iterate array
            elements / map entries / scalars, each becoming `this`
            for the subquery body.
  explode — runtime/sam/op/explode/explode.go:23: `explode by type T
            as name` — one output record per constituent value of
            type T.

Spark-first: explode()/posexplode() generators, which stay inside
whole-stage codegen. A lateral body that ends in an aggregation is
re-expressed as explode → groupBy(row id) → collect, or better, with
higher-order functions (transform/filter/aggregate) that never leave
the row — prefer ``over_expr`` when the body is expressible that way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def over(
    df: DataFrame,
    expr: Column | str,
    with_vars: dict[str, Column] | None = None,
    keep: list[str] | None = None,
) -> DataFrame:
    """Iterate a container column: arrays explode to elements, maps
    explode to {key,value} records (over.go semantics). The element
    becomes column ``this``; `with` bindings become sibling columns
    usable by the downstream pipeline (scope.go).

    keep: parent columns to carry alongside (default: none, matching
    zed where the subquery sees only `this` + vars).
    """
    col = F.col(expr) if isinstance(expr, str) else expr
    dtype = df.select(col.alias("__c")).schema[0].dataType
    cols: list[Column] = [F.col(k) for k in (keep or [])]
    for name, v in (with_vars or {}).items():
        cols.append(v.alias(name))
    if isinstance(dtype, T.MapType):
        out = df.select(*cols, F.explode(col).alias("key", "value"))
        return out.withColumn("this", F.struct("key", "value")).drop("key", "value")
    if isinstance(dtype, T.ArrayType):
        return df.select(*cols, F.explode(col).alias("this"))
    # scalar: one row, this = value
    return df.select(*cols, col.alias("this"))


def over_expr(arr: Column, fn) -> Column:
    """Lateral subquery as an expression when the body is a pure
    element-wise map: zed `over a |> ...` inside an expression
    (OverExpr, dag/expr.go:86-91) → higher-order transform()."""
    return F.transform(arr, fn)


def explode_op(
    df: DataFrame, *containers: str, type_filter: T.DataType | None = None, as_: str = "value"
) -> DataFrame:
    """zed `explode <exprs> by type T as name`: one output record per
    constituent value. Multiple containers concatenate."""
    cols = [F.col(c) for c in containers]
    merged = cols[0] if len(cols) == 1 else F.concat(*cols)
    out = df.select(F.explode(merged).alias(as_))
    if type_filter is not None:
        out = out.select(F.col(as_).cast(type_filter).alias(as_)).filter(F.col(as_).isNotNull())
    return out


def unnest_struct(df: DataFrame, path: str) -> DataFrame:
    """Flatten one struct column into top-level columns (helper for
    over-with-record semantics)."""
    other = [c for c in df.columns if c != path.split(".")[0]]
    return df.select(*other, f"{path}.*")
