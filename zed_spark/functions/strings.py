"""String functions (reference: runtime/sam/expr/function/string.go).

Most map 1:1 to pyspark builtins (lower/upper/trim/levenshtein are
used directly — no wrappers). Here: the few with zed-specific names
or semantics.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def rune_len(s: Column) -> Column:
    """UTF-8 rune count — Spark length() is already char-based."""
    return F.length(s)


def zsplit(s: Column, sep: str | Column) -> Column:
    """zed split(s, sep): literal separator (not regex like Spark's
    split)."""
    sep_col = F.lit(sep) if isinstance(sep, str) else sep
    # split on literal: quote regex metacharacters
    return F.split(s, F.regexp_replace(sep_col, r"([.\\+*?\[\]^$(){}=!<>|:\-#])", r"\\$1"))


def zjoin(arr: Column, sep: str | Column = "") -> Column:
    """zed join(array, sep) → array_join; a COLUMN separator (not
    expressible with array_join, whose delimiter is plan-time) folds
    with aggregate(), skipping nulls like array_join does."""
    if isinstance(sep, str):
        return F.array_join(arr, sep)
    compact = F.filter(arr, lambda x: x.isNotNull())
    acc0 = F.struct(F.lit(True).alias("first"), F.lit("").alias("s"))
    return F.aggregate(
        compact,
        acc0,
        lambda acc, x: F.struct(
            F.lit(False).alias("first"),
            F.when(acc["first"], x)
            .otherwise(F.concat(acc["s"], sep, x))
            .alias("s"),
        ),
        lambda acc: acc["s"],
    )


def zreplace(s: Column, old: str | Column, new: str | Column) -> Column:
    """zed replace(s, old, new): literal (Spark replace, not regexp)."""
    o = F.lit(old) if isinstance(old, str) else old
    n = F.lit(new) if isinstance(new, str) else new
    return F.replace(s, o, n)


def _go_re_msg(err, pat: str) -> str:
    """Render a Python re.error the way Go's regexp parser words it
    (function/regexp.go surfaces Go's messages; the common cases are
    mapped, anything else keeps Python's text)."""
    m = str(getattr(err, "msg", err))
    if "missing )" in m or "unbalanced parenthesis" in m:
        gomsg = "missing closing )"
    elif "unterminated character set" in m:
        gomsg = "missing closing ]"
    else:
        gomsg = m
    return f"error parsing regexp: {gomsg}: `{pat}`"


def regexp_match_err(pattern: Column, s: Column) -> Column:
    """zed regexp(re, s) with first-class parse errors: returns a
    value|error carrier struct<tag,v0:array<string>,e1:string> —
    invalid patterns become error("regexp: error parsing regexp:
    ...") values (function/regexp.go), non-matches null arrays."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("tag int, v0 array<string>, e1 string")
    def _m(p, x):
        import re as _r

        tags, vals, errs = [], [], []
        for pp, xx in zip(p, x):
            tag, val, err = 0, None, None
            if pp is not None:
                try:
                    rx = _r.compile(pp)
                    if xx is not None:
                        m = rx.search(xx)
                        if m is not None:
                            val = [
                                m.group(0),
                                *[g if g is not None else "" for g in m.groups()],
                            ]
                except _r.error as ex:
                    tag, err = 1, f"regexp: {_go_re_msg(ex, pp)}"
            tags.append(tag)
            vals.append(val)
            errs.append(err)
        return pd.DataFrame({"tag": tags, "v0": vals, "e1": errs})

    return _m(pattern, s)


def regexp_match(pattern: Column, s: Column) -> Column:
    """zed regexp(re, s): leftmost match → [full, group1, ...]
    (function/regexp.go wraps Go FindStringSubmatch). Patterns are
    per-row values, so this is an Arrow-batched Pandas UDF (a literal
    pattern should use rlike/regexp_extract instead — JVM-side).
    Invalid patterns and non-matches return null (the reference
    returns error(...) for bad patterns; expression-level error
    values are a documented gap)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def _m(p, x):
        import re as _r

        out = []
        for pp, xx in zip(p, x):
            if pp is None or xx is None:
                out.append(None)
                continue
            try:
                m = _r.search(pp, xx)
            except _r.error:
                out.append(None)
                continue
            out.append(
                None
                if m is None
                else [m.group(0), *[g if g is not None else "" for g in m.groups()]]
            )
        return pd.Series(out)

    return _m(pattern, s)


def regexp_replace_err(s: Column, pattern: Column, new: Column) -> Column:
    """zed regexp_replace with first-class errors: parse failures
    become error("regexp_replace: error parsing regexp: ...") values
    in a struct<tag,v0:string,e1:string> carrier (null pattern/new
    handling and arg-type errors compose in the compiler)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("tag int, v0 string, e1 string")
    def _r(x, p, n):
        import re as _re

        def go_repl(repl: str) -> str:
            def sub(m):
                g = m.group(1) or m.group(2)
                if g == "$":
                    return "$"
                return f"\\g<{g}>"

            return _re.sub(r"\$(?:\{(\w+)\}|(\w+|\$))", sub, repl)

        tags, vals, errs = [], [], []
        for xx, pp, nn in zip(x, p, n):
            tag, val, err = 0, None, None
            if pp is not None and nn is not None:
                try:
                    rx = _re.compile(pp)
                    if xx is not None:
                        val = rx.sub(go_repl(nn), xx)
                except _re.error as ex:
                    tag, err = 1, f"regexp_replace: {_go_re_msg(ex, pp)}"
            elif xx is not None:
                val = xx
            tags.append(tag)
            vals.append(val)
            errs.append(err)
        return pd.DataFrame({"tag": tags, "v0": vals, "e1": errs})

    return _r(s, pattern, new)


def regexp_replace_dyn(s: Column, pattern: Column, new: Column) -> Column:
    """zed regexp_replace with per-row patterns or Go-style $N/$name
    group references (function/regexp.go ReplaceAllString). Go's $X
    named refs aren't Java-compatible, so this translates to Python
    \\g<X> and runs as a Pandas UDF. Literal patterns with no $-refs
    compile to the JVM builtin in the caller instead."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _r(x, p, n):
        import re as _re

        def go_repl(repl: str) -> str:
            # $$ → literal $; $1 → \1; $name / ${name} → \g<name>
            def sub(m):
                g = m.group(1) or m.group(2)
                if g == "$":
                    return "$"
                return f"\\g<{g}>"

            return _re.sub(r"\$(?:\{(\w+)\}|(\w+|\$))", sub, repl)

        out = []
        for xx, pp, nn in zip(x, p, n):
            if xx is None:
                out.append(None)
                continue
            if pp is None or nn is None:
                out.append(None)
                continue
            try:
                out.append(_re.sub(pp, go_repl(nn), xx))
            except _re.error:
                out.append(None)
        return pd.Series(out)

    return _r(s, pattern, new)
