"""Small operators: assert, sample, load (into a pool).

Reference:
  assert — desugars to `yield cond ? this : error({...})`
           (compiler/semantic/op.go:753-792)
  sample — `any(this) by typeof(this)`: one exemplar per shape
           (semantic/op.go:727-752)
  load   — write results into a lake pool with commit metadata
           (dag/op.go:75-82; runtime/sam/op/load/load.go:23)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from zed_spark import errors as E


def assert_op(df: DataFrame, cond: Column, expr_text: str = "") -> DataFrame:
    """Rows failing the condition keep their values nulled-out in
    spirit? No — zed keeps the value wrapped in an error; our
    convention records the failure in the error column and keeps the
    row (so downstream has_error() can route it)."""
    return E.with_error(df, "assert", ~F.coalesce(cond, F.lit(False)),
                        f"assertion failed: {expr_text}" if expr_text else "assertion failed")


def sample_op(dfs: DataFrame | list[DataFrame]) -> DataFrame:
    """One exemplar per shape. A DataFrame is one shape; a
    heterogeneous input (list of frames) yields one row per frame,
    fused to the superset schema."""
    from zed_spark.operators.fuse import fuse_dataframes

    if isinstance(dfs, DataFrame):
        return dfs.limit(1)
    return fuse_dataframes([d.limit(1) for d in dfs])


def load_op(df: DataFrame, pool, author: str = "", message: str = "") -> str:
    """Terminal load into a lake pool (returns the commit id)."""
    return pool.load(df, author=author, message=message)
