"""sort / head / tail / top / uniq.

Reference semantics:
  sort — multi-key, per-key asc/desc, nulls first/last, external
         spill (runtime/sam/op/sort/sort.go:18,34). Spark's
         UnsafeExternalSorter gives the external behavior for free.
  head — head/head.go:12 → df.limit (Catalyst CollectLimit).
  tail — tail/tail.go:17: last N of the input ORDER. DataFrames are
         unordered, so tail is defined relative to an order key.
  top  — top/top.go:12: heap top-N, descending → orderBy desc +
         limit, which Catalyst executes as TakeOrderedAndProject
         (a per-partition heap + merge — same algorithm, distributed).
  uniq — uniq/uniq.go:21: ADJACENT dedup (Unix uniq), not global
         dropDuplicates. Needs an explicit order; implemented with a
         lag() window.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _sort_cols(keys, descending=False, nulls_first: bool | None = None) -> list[Column]:
    cols = []
    for k in keys:
        if isinstance(k, Column):
            cols.append(k)
            continue
        desc = descending
        name = k
        if isinstance(k, str) and k.startswith("-"):
            desc, name = True, k[1:]
        c = F.col(name)
        # zed default: nulls sort last on asc, first on desc
        # (docs/language/operators/sort.md); Spark default differs, so
        # always make it explicit.
        nf = nulls_first if nulls_first is not None else desc
        if desc:
            c = c.desc_nulls_first() if nf else c.desc_nulls_last()
        else:
            c = c.asc_nulls_first() if nf else c.asc_nulls_last()
        cols.append(c)
    return cols


def sort(
    df: DataFrame,
    *keys,
    descending: bool = False,
    nulls_first: bool | None = None,
) -> DataFrame:
    """Multi-key sort. Prefix a key with '-' for descending."""
    return df.orderBy(*_sort_cols(keys, descending, nulls_first))


def head(df: DataFrame, n: int = 1) -> DataFrame:
    return df.limit(n)


def tail(df: DataFrame, n: int, order_by: list[str] | None = None) -> DataFrame:
    """Last n rows relative to order_by (ascending). Implemented as
    reverse-order limit + re-sort, which Catalyst runs as
    TakeOrderedAndProject — no full sort, no single-node bottleneck.
    """
    if not order_by:
        raise ValueError("tail on an unordered DataFrame needs order_by keys")
    rev = df.orderBy(*[F.col(k).desc() for k in order_by]).limit(n)
    return rev.orderBy(*[F.col(k).asc() for k in order_by])


def top(df: DataFrame, n: int, *keys) -> DataFrame:
    """Top-n by keys, descending (reference is descending-only,
    top.go:12-40). Catalyst: TakeOrderedAndProject."""
    return df.orderBy(*[F.col(k).desc() if isinstance(k, str) else k for k in keys]).limit(n)


def uniq(
    df: DataFrame,
    order_by: list[str],
    compare_cols: list[str] | None = None,
    count: bool = False,
) -> DataFrame:
    """Adjacent dedup over an explicit order (zed uniq [-c]).

    compare_cols: the columns forming the compared record (models
    `... | cut X | uniq` where arrival order comes from upstream
    columns that are no longer part of the value). Defaults to all
    non-order columns.

    Scale note: a global order means a single-partition window — the
    reference operator is equally sequential (one goroutine). For the
    distributed case prefer summarize-by or dedup.exact_dedup.
    """
    cmp_cols = compare_cols or [c for c in df.columns if c not in order_by]
    w = Window.orderBy(*[F.col(k) for k in order_by])
    fp = F.struct(*[F.col(c) for c in cmp_cols])
    out = df.withColumn("__prev", F.lag(fp).over(w))
    is_new = F.col("__prev").isNull() | (fp != F.col("__prev"))
    if count:
        # run-length: count rows per adjacent run
        out = out.withColumn("__run", F.sum(F.when(is_new, 1).otherwise(0)).over(w))
        return (
            out.groupBy("__run", *cmp_cols)
            .agg(F.count(F.lit(1)).alias("count"))
            .drop("__run")
        )
    return out.filter(is_new).select(*cmp_cols)
