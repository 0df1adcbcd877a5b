"""grep — match a pattern against any value's string form
(reference: runtime/sam/expr/function/grep.go; search-expression
desugar docs/language/search-expressions.md).

Semantics: substring (default), glob, or regexp match over the
textual rendering of the value — for records, over every field
recursively. Implemented over to_json, which is correct and keeps
everything JVM-side; the reference's byte-prescan acceleration
(bufferfilter.go) is replaced by parquet pushdown on the normal
column predicates that usually accompany a grep.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


def _render(e: Column) -> Column:
    return F.to_json(F.struct(e.alias("v")))


def grep(pattern: str, e: Column, mode: str = "substring") -> Column:
    """mode: substring | glob | regexp. Substring grep is
    case-insensitive like zed search terms (grep.go uses the same
    string matcher; ztest language-background-7)."""
    blob = _render(e)
    if mode == "substring":
        return F.lower(blob).contains(pattern.lower())
    if mode == "glob":
        rx = glob_to_regex(pattern)
        return blob.rlike(rx)
    if mode == "regexp":
        return blob.rlike(pattern)
    raise ValueError(f"grep mode {mode!r}")


def glob_to_regex(glob: str) -> str:
    """zed glob (* and ?) → regex, anchored at token boundaries."""
    out = []
    for ch in glob:
        if ch == "*":
            out.append("[^\"]*")
        elif ch == "?":
            out.append("[^\"]")
        else:
            out.append(re.escape(ch))
    return "".join(out)
