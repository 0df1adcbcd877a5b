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


def zjoin(arr: Column, sep: str = "") -> Column:
    """zed join(array, sep) → array_join."""
    return F.array_join(arr, sep)


def zreplace(s: Column, old: str | Column, new: str | Column) -> Column:
    """zed replace(s, old, new): literal (Spark replace, not regexp)."""
    o = F.lit(old) if isinstance(old, str) else old
    n = F.lit(new) if isinstance(new, str) else new
    return F.replace(s, o, n)
