"""Row-transform operators: cut, drop, put, rename, yield.

Reference implementations (for semantics only, not design):
  cut    — runtime/sam/expr/cutter.go   (project fields, keep nesting)
  drop   — runtime/sam/expr/dropper.go  (remove fields)
  put    — runtime/sam/expr/putter.go   (add/overwrite nested fields)
  rename — runtime/sam/expr/renamer.go  (rename within a record)
  yield  — runtime/sam/op/yield/yield.go (N output exprs per input)

All are pure projections: Catalyst collapses them into the scan
(column pruning), so chains of cut/put/drop cost nothing extra.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from zed_spark import schema as zschema


def _parse_assignment(spec: str) -> tuple[str, str | None]:
    """'c:=a.b' -> ('a.b', 'c');  'a.b' -> ('a.b', None)."""
    if ":=" in spec:
        alias, path = spec.split(":=", 1)
        return path.strip(), alias.strip()
    return spec.strip(), None


def cut(df: DataFrame, *specs: str) -> DataFrame:
    """Project the listed (possibly nested, possibly renamed) paths.

    ``cut(df, "a.b", "c:=x.y")`` → schema {a:{b}, c}. Missing fields
    are a compile-time error here (Spark resolves statically) — the
    reference yields error("missing") per-value (SURVEY §7.4).
    """
    return zschema.project_paths(df, [_parse_assignment(s) for s in specs])


def drop(df: DataFrame, *paths: str) -> DataFrame:
    out = df
    for p in paths:
        out = zschema.drop_path(out, p)
    return out


def put(df: DataFrame, **assignments: Column) -> DataFrame:
    """put field:=expr — add or overwrite fields. Use ``put_path`` for
    nested targets (Python kwargs can't contain dots)."""
    out = df
    for name, col in assignments.items():
        out = out.withColumn(name, col)
    return out


def put_path(df: DataFrame, path: str, value: Column) -> DataFrame:
    return zschema.set_path(df, path, value)


def rename(df: DataFrame, **mapping: str) -> DataFrame:
    """rename(new=old): rename fields; nested via put_path/rename_path."""
    out = df
    for new, old in mapping.items():
        out = zschema.rename_path(out, old, new)
    return out


# root-null marker inside __zed_missing: the row's VALUE is null at
# the record level (a null record splat erases this otherwise —
# expr/ztests/cast-name-only yields null(foo), not {x:null})
NULL_ROW = "\x00nullrow"


def yield_(
    df: DataFrame, *exprs: Column, null_sentinel: bool = False
) -> DataFrame:
    """Map each input value to one or more outputs.

    One expr → plain select. N exprs → each input row produces N
    output rows (reference: yield.go:15 emits every expr per value);
    expressed as explode over an array of the exprs, which stays in
    whole-stage codegen.

    Each expr should be a struct() column (zed values are records
    here); the exploded struct's fields become the output columns.
    With null_sentinel, a null record value marks its splatted row
    via the NULL_ROW entry in __zed_missing so writers/compares can
    render it as a bare null instead of an all-null-fields record.
    """
    if len(exprs) == 1:
        e = exprs[0]
        out = df.select(e.alias("__y"))
    else:
        out = df.select(F.explode(F.array(*exprs)).alias("__y"))
    if null_sentinel:
        return out.select(
            "__y.*",
            F.when(
                F.col("__y").isNull(), F.array(F.lit(NULL_ROW))
            ).alias("__zed_missing"),
        )
    # flatten the struct into top-level columns
    return out.select("__y.*")
