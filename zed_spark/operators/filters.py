"""where / filter (reference: runtime/sam/expr/filter.go:250-259).

Search-expression sugar (bare terms matching any field, reference:
docs/language/search-expressions.md) is provided by ``search``:
a predicate over the JSON rendering of the whole row. Correct but
slow by design — the reference accelerates with a byte-level
prescan (bufferfilter.go); our fast path is a normal column
predicate, which Catalyst pushes into the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def where(df: DataFrame, predicate: Column | str) -> DataFrame:
    """Keep rows where predicate is true. Accepts a Column or a SQL
    expression string (``df.filter`` handles both; Catalyst pushes
    simple predicates into the scan)."""
    return df.filter(predicate)


def search(df: DataFrame, term: str, case_sensitive: bool = False) -> DataFrame:
    """Bare-word search across ALL fields (recursively), zed's
    implied-search semantics. Implemented over to_json(struct(*))."""
    blob = F.to_json(F.struct(*[F.col(c) for c in df.columns]))
    if not case_sensitive:
        blob = F.lower(blob)
        term = term.lower()
    return df.filter(blob.contains(term))


def search_regex(df: DataFrame, pattern: str) -> DataFrame:
    """Regexp search across all fields (zed ``/re/`` search term)."""
    blob = F.to_json(F.struct(*[F.col(c) for c in df.columns]))
    return df.filter(blob.rlike(pattern))
