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


# --- C-style strftime (docs/language/functions/strftime.md) ---------------
# Full directive set; rendering is pure Python (directive table), with
# a Java DateTimeFormatter translation for the literal-format common
# subset so the hot path stays JVM-side.

_STRFTIME_FNS = {
    "A": lambda d: d.strftime("%A"),
    "a": lambda d: d.strftime("%a"),
    "B": lambda d: d.strftime("%B"),
    "b": lambda d: d.strftime("%b"),
    "C": lambda d: f"{d.year // 100:02d}",
    "c": lambda d: d.strftime("%a %b ") + f"{d.day:2d} " + d.strftime("%H:%M:%S %Y"),
    "D": lambda d: d.strftime("%m/%d/%y"),
    "d": lambda d: f"{d.day:02d}",
    "e": lambda d: f"{d.day:2d}",
    "F": lambda d: d.strftime("%Y-%m-%d"),
    "H": lambda d: f"{d.hour:02d}",
    "I": lambda d: d.strftime("%I"),
    "j": lambda d: d.strftime("%j"),
    "k": lambda d: f"{d.hour:2d}",
    "l": lambda d: f"{(d.hour % 12) or 12:2d}",
    "M": lambda d: f"{d.minute:02d}",
    "m": lambda d: f"{d.month:02d}",
    "n": lambda d: "\n",
    "p": lambda d: "AM" if d.hour < 12 else "PM",
    "R": lambda d: d.strftime("%H:%M"),
    "r": lambda d: d.strftime("%I:%M:%S ") + ("AM" if d.hour < 12 else "PM"),
    "S": lambda d: f"{d.second:02d}",
    "T": lambda d: d.strftime("%H:%M:%S"),
    "t": lambda d: "\t",
    "U": lambda d: d.strftime("%U"),
    "u": lambda d: str(d.isoweekday()),
    "V": lambda d: f"{d.isocalendar()[1]:02d}",
    "v": lambda d: f"{d.day:2d}-" + d.strftime("%b-%Y"),
    "W": lambda d: d.strftime("%W"),
    "w": lambda d: d.strftime("%w"),
    "X": lambda d: d.strftime("%H:%M:%S"),
    "x": lambda d: d.strftime("%m/%d/%y"),
    "Y": lambda d: str(d.year),
    "y": lambda d: d.strftime("%y"),
    "Z": lambda d: "UTC",
    "z": lambda d: "+0000",
    "%": lambda d: "%",
}

_STRFTIME_VALID = "".join(_STRFTIME_FNS)


def strftime_pattern_error(fmt: str) -> str | None:
    """Return the offending '%x' token when fmt has an unsupported
    directive (or a trailing lone '%'), else None."""
    i, n = 0, len(fmt)
    while i < n:
        if fmt[i] == "%":
            if i + 1 >= n:
                return "%"
            if fmt[i + 1] not in _STRFTIME_FNS:
                return fmt[i : i + 2]
            i += 2
        else:
            i += 1
    return None


def strftime_compile_message(bad: str) -> str:
    """The reference's pattern-compile error text (lestrrat strftime
    via time.go), replicated for error-value parity."""
    return (
        "strftime: failed to compile format: pattern compilation "
        f"failed: lookup failed: '{bad}' was not found in "
        "specification set"
    )


def strftime_render(fmt: str, d) -> str:
    out, i, n = [], 0, len(fmt)
    while i < n:
        if fmt[i] == "%" and i + 1 < n and fmt[i + 1] in _STRFTIME_FNS:
            out.append(_STRFTIME_FNS[fmt[i + 1]](d))
            i += 2
        else:
            out.append(fmt[i])
            i += 1
    return "".join(out)


# directive → Java DateTimeFormatter pattern for the JVM fast path;
# directives absent here (blank-padded %e/%k/%l, week numbers, …)
# fall back to the Python renderer
_JAVA_PATTERNS = {
    "A": "EEEE", "a": "EEE", "B": "MMMM", "b": "MMM", "d": "dd",
    "H": "HH", "I": "hh", "j": "DDD", "M": "mm", "m": "MM",
    "p": "a", "S": "ss", "Y": "yyyy", "y": "yy",
}


def java_pattern(fmt: str) -> str | None:
    """Translate to a DateTimeFormatter pattern, or None when a
    directive has no Java equivalent. Literal runs are single-quoted
    (Java patterns treat bare letters as fields)."""
    out, i, n = [], 0, len(fmt)
    lit: list[str] = []

    def flush():
        if lit:
            out.append("'" + "".join(lit).replace("'", "''") + "'")
            lit.clear()

    while i < n:
        if fmt[i] == "%" and i + 1 < n:
            c = fmt[i + 1]
            if c == "%":
                lit.append("%")
            elif c in _JAVA_PATTERNS:
                flush()
                out.append(_JAVA_PATTERNS[c])
            else:
                return None
            i += 2
        else:
            lit.append(fmt[i])
            i += 1
    flush()
    return "".join(out)


def strftime_dyn(fmt: Column, ts: Column) -> Column:
    """Per-row formats: Arrow-batched Pandas UDF over (fmt, time).
    Invalid patterns yield null here — the compiler surfaces them as
    first-class error values via its value-error slots."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _fmt(f, t):
        def one(fv, tv):
            if fv is None or tv is None or pd.isna(tv):
                return None
            if strftime_pattern_error(fv) is not None:
                return None
            return strftime_render(fv, tv)

        return pd.Series([one(fv, tv) for fv, tv in zip(f, t)])

    return _fmt(fmt, ts)


def strftime_bad_token(fmt: Column) -> Column:
    """JVM-side extraction of the first unsupported '%x' token
    ('' when the pattern is clean) — drives the value-error slot."""
    pat = f"%([^{_STRFTIME_VALID}]|$)"
    return F.regexp_extract(fmt, pat, 0)


def now() -> Column:
    return F.current_timestamp()


# --- ns-precision rendering (reference pkg/nano) ---------------------------
#
# Spark timestamps are µs; the reference keeps int64 ns end-to-end
# (nano.Ts / nano.Duration). When per-row type identity marks an
# int64 column as `time` or `duration` (the __zed_types sidecar /
# ns-opt-in parse), these formatters reproduce the reference's text
# forms exactly (duration.go:String, Ts.Time RFC3339 w/ ns).

_DUR_UNITS = (
    ("y", 365 * 24 * 3600 * 1_000_000_000),
    ("d", 24 * 3600 * 1_000_000_000),
    ("h", 3600 * 1_000_000_000),
    ("m", 60 * 1_000_000_000),
)
_MIN_DUR = "-292y171d23h47m16.854775808s"


def format_duration_ns(ns: int) -> str:
    """int64 ns → zed duration text (pkg/nano/duration.go String)."""
    if ns == -(2**63):
        return _MIN_DUR
    if ns == 0:
        return "0s"
    out = []
    if ns < 0:
        ns = -ns
        out.append("-")
    for name, size in _DUR_UNITS:
        if ns >= size:
            n, ns = divmod(ns, size)
            if n:
                out.append(f"{n}{name}")
            if ns == 0:
                return "".join(out)

    def fixed(val: int, scale: int) -> str:
        whole, rem = divmod(val, scale)
        s = str(whole) + "."
        scale //= 10
        while rem > 0:
            d, rem = divmod(rem, scale)
            s += str(d)
            scale //= 10
        return s

    if ns % 1_000_000_000 == 0:
        out.append(f"{ns // 1_000_000_000}s")
    elif ns > 1_000_000_000:
        out.append(fixed(ns, 1_000_000_000) + "s")
    elif ns % 1_000_000 == 0:
        out.append(f"{ns // 1_000_000}ms")
    elif ns > 1_000_000:
        out.append(fixed(ns, 1_000_000) + "ms")
    elif ns % 1_000 == 0:
        out.append(f"{ns // 1_000}us")
    elif ns > 1_000:
        out.append(fixed(ns, 1_000) + "us")
    else:
        out.append(f"{ns}ns")
    return "".join(out)


def format_time_ns(ns: int) -> str:
    """int64 ns since epoch → RFC3339 with ns fraction (nano.Ts)."""
    from datetime import datetime, timezone

    secs, frac = divmod(ns, 1_000_000_000)  # floor div: pre-epoch ok
    dt = datetime.fromtimestamp(secs, tz=timezone.utc)
    base = dt.strftime("%Y-%m-%dT%H:%M:%S")
    if frac:
        return f"{base}.{frac:09d}".rstrip("0") + "Z"
    return base + "Z"


def zeek_seconds_ns(ns: int) -> str:
    """int64 ns → zeek fixed-point seconds: 6 decimals, or 9 when
    the value carries sub-µs precision (zio/zeekio writer)."""
    sign = "-" if ns < 0 else ""
    a = abs(ns)
    if a % 1_000:
        return f"{sign}{a // 1_000_000_000}.{a % 1_000_000_000:09d}"
    us = a // 1_000
    return f"{sign}{us // 1_000_000}.{us % 1_000_000:06d}"
