"""summarize — hash aggregation with zed's agg-function set.

Reference: runtime/sam/op/groupby/groupby.go (594 LoC hash table,
spill, partials). In Spark all of that is built in: HashAggregate
does partial/final decomposition (the reference's PartialsIn/Out,
dag/op.go:134-142) and spills automatically; we just declare the
aggregation.

Agg functions (reference: runtime/sam/expr/agg/agg.go:30-80):
  count sum avg min max any dcount collect union collect_map and or
plus per-agg `where` filters (compiler/semantic/op.go:1102) and
`every(dur)` time bucketing (function/time.go:17-60).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# name -> builder(Column) -> Column
_AGG_FNS = {
    "count": lambda e: F.count(e if e is not None else F.lit(1)),
    "sum": F.sum,
    "avg": F.avg,
    "min": F.min,
    "max": F.max,
    "any": lambda e: F.first(e, ignorenulls=True),
    "dcount": F.approx_count_distinct,
    "dcount_exact": F.count_distinct,
    "collect": lambda e: F.collect_list(e),
    # set semantics with FIRST-SEEN order (agg/collect.go Union keeps
    # encounter order; ztest agg/container); nulls don't join the set
    "union": lambda e: F.array_distinct(F.array_compact(F.collect_list(e))),
    "and": F.bool_and,
    "or": F.bool_or,
    "collect_map": lambda e: F.map_from_entries(
        F.collect_list(F.struct(e.getField("key"), e.getField("value")))
    ),
}


def agg_expr(
    fn: str,
    expr: Column | str | None = None,
    where: Column | None = None,
    elem_type=None,
) -> Column:
    """Build one aggregation column.

    fn: one of the zed agg names. where: per-agg filter — rows where
    the condition is false contribute nothing (reference semantics:
    the where clause gates Consume, semantic/op.go:1102).
    elem_type: the aggregated expression's DataType — lets `union`
    emit its set in canonical zcode order (complex.go NormalizeSet).
    """
    if fn not in _AGG_FNS:
        raise ValueError(f"unknown agg function {fn!r}; have {sorted(_AGG_FNS)}")
    col = F.col(expr) if isinstance(expr, str) else expr
    if where is not None:
        if fn == "count":
            col = F.when(where, F.lit(1) if col is None else col)
        else:
            col = F.when(where, col)
    if (
        fn == "collect_map"
        and elem_type is not None
        and elem_type.typeName() == "map"
    ):
        # collect_map over |{k:v}| map values: merge entries across
        # the group, later values overwriting earlier (collectmap.go
        # stores into one map as consumed). Last-wins is expressed
        # as reverse → keep-first-seen → reverse, all JVM-side.
        entries = F.flatten(F.collect_list(F.map_entries(col)))
        rev = F.reverse(entries)
        keys = F.transform(rev, lambda x: x["key"])
        kept = F.filter(
            rev,
            lambda x, i: F.array_position(keys, x["key"]) == i + 1,
        )
        merged = F.map_from_entries(F.reverse(kept))
        return F.when(F.size(merged) > 0, merged)
    out = _AGG_FNS[fn](col)
    if fn == "union" and elem_type is not None:
        from zed_spark.functions.zorder import zset_sort
        from zed_spark.schema import is_union_type

        if is_union_type(elem_type):
            # a tagged struct holding a typed null is non-null to
            # array_compact — drop elements whose selected member is
            # null (zed union() collects VALUES; nulls don't join)
            vf = [f.name for f in elem_type.fields[1:]]
            out = F.filter(
                out,
                lambda x: F.coalesce(
                    *[x.getField(n).cast("string") for n in vf]
                ).isNotNull(),
            )
        out = zset_sort(out, elem_type)
    if fn in ("collect", "union"):
        # an agg that consumed ZERO values is null, not an empty
        # container (agg/collect.go Result; summarize.md group with
        # a never-true where: `array:null`)
        out = F.when(F.size(out) > 0, out)
    return out


_INTERVAL_US = {
    "microsecond": 1,
    "millisecond": 1_000,
    "second": 1_000_000,
    "minute": 60_000_000,
    "hour": 3_600_000_000,
    "day": 86_400_000_000,
    "week": 604_800_000_000,
}


def _interval_us(interval: str) -> int:
    """'1 hour' / '5 minutes' / '250 milliseconds' → microseconds."""
    total = 0
    toks = interval.strip().split()
    for n, unit in zip(toks[::2], toks[1::2]):
        total += int(float(n) * _INTERVAL_US[unit.rstrip("s")])
    if total <= 0:
        raise ValueError(f"bad bucket interval {interval!r}")
    return total


def every_key(ts: Column | str, duration: str, dtype=None) -> Column:
    """Time-bucket key: truncate ts to fixed-width bins — zed
    ``every(d)`` desugars to ``bucket(ts, d)`` (function/time.go:17).
    duration is a Spark interval string like '1 hour', '5 minutes'.

    Arithmetic bucketing rather than F.window(): the TimeWindowing
    analyzer rule injects `Filter isnotnull(ts)` which silently DROPS
    null-ts rows, but zed keeps a null group (groupby ztest
    `groupby.yaml` forward-sorted-every-null). pmod keeps the
    floor-division exact for pre-epoch timestamps too. Pass dtype to
    preserve a TIMESTAMP_NTZ input type on the bucket key.
    """
    c = F.col(ts) if isinstance(ts, str) else ts
    us = _interval_us(duration)
    # session tz is pinned UTC (session.py) — NTZ→TZ cast is a no-op
    epoch = F.unix_micros(c.cast("timestamp"))
    out = F.timestamp_micros(epoch - F.pmod(epoch, F.lit(us)))
    if dtype is not None and dtype.typeName() == "timestamp_ntz":
        out = out.cast("timestamp_ntz")
    return out


def summarize(
    df: DataFrame,
    by: dict[str, Column] | list[str] | None = None,
    aggs: dict[str, Column] | None = None,
    every: tuple[str, str] | None = None,
    **agg_specs,
) -> DataFrame:
    """Group-by + aggregate.

    by:   group keys — list of column names or {alias: Column}
    aggs: {output_name: aggregate Column} (use agg_expr to build)
    every: (ts_column, duration) adds a time-bucket key named 'ts'
    agg_specs: shorthand kwargs — name=("sum", "col") or
               name=("count", None) or name=("sum", col, where_col)

    With no keys, a global aggregation (reference: groupby with empty
    key list). Spark plans partial+final automatically.
    """
    keys: list[Column] = []
    if every is not None:
        dt = None
        if isinstance(every[0], str) and every[0] in df.columns:
            dt = df.schema[every[0]].dataType
        keys.append(every_key(every[0], every[1], dtype=dt).alias("ts"))
    if by:
        if isinstance(by, dict):
            keys.extend(c.alias(name) for name, c in by.items())
        else:
            keys.extend(F.col(k) for k in by)

    agg_cols: list[Column] = []
    for name, col in (aggs or {}).items():
        agg_cols.append(col.alias(name))
    for name, spec in agg_specs.items():
        fn, expr, *rest = spec if isinstance(spec, tuple) else (spec, None)
        if fn == "fuse":
            # fuse(e): merged type of the group's values (agg/fuse.go).
            # A DataFrame column has ONE static type, so the merged
            # type is its zed type name — constant per group.
            from zed_spark.functions.introspect import typeof_col

            agg_cols.append(F.first(typeof_col(df, expr)).alias(name))
            continue
        agg_cols.append(agg_expr(fn, expr, rest[0] if rest else None).alias(name))
    if not agg_cols:
        agg_cols = [F.count(F.lit(1)).alias("count")]

    if keys:
        return df.groupBy(*keys).agg(*agg_cols)
    return df.agg(*agg_cols)


def sample(df: DataFrame) -> DataFrame:
    """zed ``sample``: one exemplar value per shape — desugars to
    ``any(this) by typeof(this)`` (compiler/semantic/op.go:727-752).
    A DataFrame has ONE shape, so this is first() over the whole
    input; kept for API parity. Heterogeneous inputs are lists of
    DataFrames in this engine (see operators.fuse), where sample is
    first() per frame.
    """
    return df.limit(1)
