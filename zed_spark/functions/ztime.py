"""Time functions (reference: runtime/sam/expr/function/time.go).

bucket(ts, dur) truncates a timestamp into fixed-width bins — the
desugar target of `every(dur)` group-by keys (time.go:17-60).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_CALENDAR = {"year", "quarter", "month", "week", "day", "hour", "minute", "second"}


def bucket(ts: Column, duration: str) -> Column:
    """Truncate ts to a bin of the given width.

    duration: either a calendar unit name ('hour', 'day', …) →
    date_trunc, or a Spark interval string ('5 minutes', '90 seconds')
    → window() bucketing, which handles arbitrary widths.
    """
    if duration in _CALENDAR:
        return F.date_trunc(duration, ts)
    return F.window(ts, duration).getField("start")


def strftime(fmt: str, ts: Column) -> Column:
    """Format time (time.go strftime) → date_format. The format string
    here is Spark's (not C strftime); common conversions:
    %Y-%m-%d %H:%M:%S ≡ 'yyyy-MM-dd HH:mm:ss'."""
    conv = (
        fmt.replace("%Y", "yyyy").replace("%m", "MM").replace("%d", "dd")
        .replace("%H", "HH").replace("%M", "mm").replace("%S", "ss")
    )
    return F.date_format(ts, conv)


def now() -> Column:
    return F.current_timestamp()
