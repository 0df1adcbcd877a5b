"""ZFrame — fluent pipeline API over a DataFrame.

Mirrors the zed pipeline model (docs/language/pipeline-model.md):
each method is one pipeline operator, returns a new ZFrame, and the
whole chain stays a single lazily-planned Catalyst query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame

from zed_spark import operators as ops


class ZFrame:
    def __init__(self, df: DataFrame):
        self.df = df

    def _wrap(self, df: DataFrame) -> "ZFrame":
        return ZFrame(df)

    # --- row transforms --------------------------------------------
    def where(self, predicate: Column | str) -> "ZFrame":
        return self._wrap(ops.where(self.df, predicate))

    def search(self, term: str) -> "ZFrame":
        from zed_spark.operators.filters import search

        return self._wrap(search(self.df, term))

    def cut(self, *specs: str) -> "ZFrame":
        return self._wrap(ops.cut(self.df, *specs))

    def drop(self, *paths: str) -> "ZFrame":
        return self._wrap(ops.drop(self.df, *paths))

    def put(self, **assignments: Column) -> "ZFrame":
        return self._wrap(ops.put(self.df, **assignments))

    def put_path(self, path: str, value: Column) -> "ZFrame":
        from zed_spark.operators.project import put_path

        return self._wrap(put_path(self.df, path, value))

    def rename(self, **mapping: str) -> "ZFrame":
        return self._wrap(ops.rename(self.df, **mapping))

    def yield_(self, *exprs: Column) -> "ZFrame":
        return self._wrap(ops.yield_(self.df, *exprs))

    # --- order / limit ---------------------------------------------
    def sort(self, *keys, **kw) -> "ZFrame":
        return self._wrap(ops.sort(self.df, *keys, **kw))

    def head(self, n: int = 1) -> "ZFrame":
        return self._wrap(ops.head(self.df, n))

    def tail(self, n: int, order_by: list[str] | None = None) -> "ZFrame":
        return self._wrap(ops.tail(self.df, n, order_by))

    def top(self, n: int, *keys) -> "ZFrame":
        return self._wrap(ops.top(self.df, n, *keys))

    def uniq(self, order_by: list[str], compare_cols=None, count: bool = False) -> "ZFrame":
        return self._wrap(ops.uniq(self.df, order_by, compare_cols, count))

    # --- aggregation -----------------------------------------------
    def summarize(self, by=None, aggs=None, every=None, **agg_specs) -> "ZFrame":
        return self._wrap(ops.summarize(self.df, by, aggs, every, **agg_specs))

    # --- multi-leg -------------------------------------------------
    def join(self, other: "ZFrame | DataFrame", *args, **kw) -> "ZFrame":
        right = other.df if isinstance(other, ZFrame) else other
        return self._wrap(ops.join(self.df, right, *args, **kw))

    def fork(self, n: int, cache: bool = False) -> list["ZFrame"]:
        return [self._wrap(d) for d in ops.fork(self.df, n, cache)]

    def switch(self, cases, default=False) -> list["ZFrame"]:
        return [self._wrap(d) for d in ops.switch(self.df, cases, default)]

    def combine(self, *others: "ZFrame") -> "ZFrame":
        return self._wrap(ops.combine([self.df] + [o.df for o in others]))

    def merge(self, *others: "ZFrame", keys: list[str]) -> "ZFrame":
        return self._wrap(ops.merge([self.df] + [o.df for o in others], *keys))

    # --- shaping / traversal ---------------------------------------
    def fuse(self, *others: "ZFrame") -> "ZFrame":
        if others:
            return self._wrap(ops.fuse_dataframes([self.df] + [o.df for o in others]))
        return self._wrap(ops.fuse(self.df))

    def shape(self, target) -> "ZFrame":
        return self._wrap(ops.shape_to(self.df, target))

    def over(self, expr, with_vars=None, keep=None) -> "ZFrame":
        return self._wrap(ops.over(self.df, expr, with_vars, keep))

    def explode(self, *containers: str, **kw) -> "ZFrame":
        return self._wrap(ops.explode_op(self.df, *containers, **kw))

    # --- escape hatches --------------------------------------------
    def select(self, *cols) -> "ZFrame":
        return self._wrap(self.df.select(*cols))

    def apply(self, fn) -> "ZFrame":
        """Apply a DataFrame->DataFrame function (user operator,
        reference OpDecl semantic/op.go:857)."""
        return self._wrap(fn(self.df))

    def collect(self):
        return self.df.collect()

    def show(self, *a, **kw):
        return self.df.show(*a, **kw)

    def explain(self, *a, **kw):
        return self.df.explain(*a, **kw)
