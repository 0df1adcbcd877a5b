"""Misc scalar functions: compare, coalesce-with-errors, base64/hex,
ksuid (reference: compare.go, coalesce.go, bytes.go, ksuid.go).

abs/ceil/floor/round/sqrt/pow/log and least/greatest (zed variadic
min/max, math.go) are the pyspark builtins — use them directly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def compare(a: Column, b: Column, nulls_max: bool = True) -> Column:
    """Total-order comparator → -1/0/1 (compare.go). Nulls sort max
    (default) or min."""
    null_rank = F.lit(1) if nulls_max else F.lit(-1)
    return (
        F.when(a.isNull() & b.isNull(), 0)
        .when(a.isNull(), null_rank)
        .when(b.isNull(), -null_rank)
        .when(a < b, -1)
        .when(a > b, 1)
        .otherwise(0)
    )


def coalesce(*cols: Column) -> Column:
    """First non-null (zed: first non-null, non-error — with the
    error-map convention, error'd values are already null here)."""
    return F.coalesce(*cols)


def to_base64(e: Column) -> Column:
    return F.base64(e.cast("binary"))


def from_base64(e: Column) -> Column:
    return F.unbase64(e)


def to_hex(e: Column) -> Column:
    return F.hex(e)


def from_hex(e: Column) -> Column:
    return F.unhex(e)


def ksuid(e: Column) -> Column:
    """ksuid decode (ksuid.go). Niche — the reference renders ksuids
    as base62 strings; we keep the string form (identity)."""
    return e.cast("string")
