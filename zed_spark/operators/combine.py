"""Stream-splitting / recombining operators.

Reference:
  fork    — runtime/sam/op/fork/fork.go + op/router.go (copy stream
            into parallel legs)
  switch  — runtime/sam/op/switcher/switch.go:25 (route by first
            matching case) and exprswitch/exprswitch.go:26 (route by
            expression value)
  combine — runtime/sam/op/combine/combine.go:23 (unordered union)
  merge   — runtime/sam/op/merge/merge.go:15-40 (ordered union:
            heap-merge preserving sort)
  mirror  — runtime/sam/op/mirror/mirror.go:15 (tee to a side output)

Spark-first: a "leg" is just another DataFrame derived from the same
parent — Catalyst handles common-subplan reuse; .cache() the parent
when legs re-scan expensive upstream work.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from zed_spark.schema import merge_schemas, conform


def fork(df: DataFrame, n: int, cache: bool = False) -> list[DataFrame]:
    """Copy the stream into n legs. With cache=True the parent is
    materialized once instead of recomputed per leg."""
    if cache:
        df = df.cache()
    return [df] * n


def switch(
    df: DataFrame, cases: list[Column], default: bool = False, cache: bool = True
) -> list[DataFrame]:
    """Route rows to the FIRST case whose predicate matches
    (switch.go first-match semantics): case k's leg filters on
    case_k AND NOT any earlier case. With default=True a final leg
    catches non-matching rows."""
    if cache:
        df = df.cache()
    legs: list[DataFrame] = []
    not_earlier: Column = F.lit(True)
    for cond in cases:
        legs.append(df.filter(not_earlier & cond))
        not_earlier = not_earlier & ~F.coalesce(cond, F.lit(False))
    if default:
        legs.append(df.filter(not_earlier))
    return legs


def switch_on(df: DataFrame, expr: Column, values: list, default: bool = False,
              cache: bool = True) -> list[DataFrame]:
    """Route by expression value (exprswitch.go)."""
    if cache:
        df = df.cache()
    legs = [df.filter(expr == F.lit(v)) for v in values]
    if default:
        legs.append(df.filter(~expr.isin(values) | expr.isNull()))
    return legs


def combine(dfs: list[DataFrame]) -> DataFrame:
    """Unordered union of legs; schemas are fused first so legs with
    different shapes combine like the reference's heterogeneous
    stream."""
    target = merge_schemas([d.schema for d in dfs])
    out = conform(dfs[0], target)
    for d in dfs[1:]:
        out = out.unionByName(conform(d, target))
    return out


def merge(dfs: list[DataFrame], *order_keys: str) -> DataFrame:
    """Ordered union: union then orderBy — Catalyst performs
    per-partition sort + merge exchange, the distributed analog of
    the reference's heap merge (merge.go:15-40)."""
    return combine(dfs).orderBy(*order_keys)


def mirror(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Tee: returns (main, mirror) — same cached DataFrame twice."""
    c = df.cache()
    return c, c
