"""Flexible string → timestamp parsing shared by the time() cast and
the shaper's string→time field casts (the reference routes both
through the dateparse library — runtime/sam/expr/cast.go:219)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# common dateparse layouts seen in the reference's ztests/docs
_FORMATS = (
    "M/d/yyyy",
    "d MMM yyyy HH:mm",
    "dd MMM yyyy HH:mm:ss",
    "MMM d, yyyy h:mm:ss a",
    "MMM d, yyyy",
    "M/d/yyyy h:mma",
    "M/d/yyyy h:mm a",
)


def flex_to_timestamp(col: Column) -> Column:
    """ISO-8601 first, then the dateparse layouts (case-normalized
    month names / meridiems). Null when nothing matches."""
    attempts = [F.try_to_timestamp(col)]
    for fmt in _FORMATS:
        attempts.append(F.try_to_timestamp(col, F.lit(fmt)))
        if "MMM" in fmt:
            attempts.append(F.try_to_timestamp(F.initcap(col), F.lit(fmt)))
        if fmt.endswith(("a", "mma")):
            attempts.append(F.try_to_timestamp(F.upper(col), F.lit(fmt)))
    return F.coalesce(*attempts)
