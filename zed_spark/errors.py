"""First-class error values — the engine's error/missing convention.

Reference semantics (the single most pervasive non-Spark behavior,
SURVEY §7.4): runtime errors are VALUES in the data, not exceptions —
error("missing") for absent fields (context.go:494), error("divide by
zero") for 1/0 (docs/language/expressions.md:23-31), error("quiet")
suppression (complex.go:63), first-class error(T) wrapper
(complex.go:42-65).

Convention in this engine:
  - Data columns hold NULL where the reference holds an error value.
  - A parallel hidden column ``__zed_error`` (map<string,string>:
    field path -> message) is created lazily by fallible operators.
  - Predicates: is_error / has_error read the map; quiet() clears it;
    coalesce() picks the first non-null, non-error value.

Oracle note: DuckDB-oracle queries run on clean inputs, so the error
column never materializes on the benchmark path (zero overhead).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ERROR_COL = "__zed_error"

_ERR_TYPE = T.MapType(T.StringType(), T.StringType())


def _ensure_error_col(df: DataFrame) -> DataFrame:
    if ERROR_COL in df.columns:
        return df
    return df.withColumn(ERROR_COL, F.lit(None).cast(_ERR_TYPE))


def with_error(df: DataFrame, path: str, condition: Column, message: str) -> DataFrame:
    """Record `message` for `path` on rows where condition holds."""
    df = _ensure_error_col(df)
    entry = F.create_map(F.lit(path), F.lit(message))
    merged = F.when(
        condition,
        F.map_concat(F.coalesce(F.col(ERROR_COL), F.create_map().cast(_ERR_TYPE)), entry),
    ).otherwise(F.col(ERROR_COL))
    return df.withColumn(ERROR_COL, merged)


def safe_div(df: DataFrame, out: str, num: Column, den: Column) -> DataFrame:
    """x/0 → null value + error("divide by zero") (expressions.md:23)."""
    df = df.withColumn(out, F.when(den != 0, num / den))
    return with_error(df, out, den == 0, "divide by zero")


def error(df: DataFrame, path: str, message: Column | str) -> DataFrame:
    """error(v) constructor (function.go:126): attach an error."""
    msg = F.lit(message) if isinstance(message, str) else message
    df = _ensure_error_col(df)
    return df.withColumn(
        ERROR_COL,
        F.map_concat(
            F.coalesce(F.col(ERROR_COL), F.create_map().cast(_ERR_TYPE)),
            F.create_map(F.lit(path), msg),
        ),
    )


def is_error(df: DataFrame, path: str) -> Column:
    """Predicate: does `path` hold an error on this row?"""
    if ERROR_COL not in df.columns:
        return F.lit(False)
    return F.col(ERROR_COL).getItem(path).isNotNull()


def has_error(df: DataFrame) -> Column:
    """Any error anywhere in the row (function.go has_error)."""
    if ERROR_COL not in df.columns:
        return F.lit(False)
    return F.col(ERROR_COL).isNotNull() & (F.size(F.col(ERROR_COL)) > 0)


def quiet(df: DataFrame, path: str) -> DataFrame:
    """Suppress errors for a path — error("quiet") semantics
    (context.go:498): downstream treats the value as absent/null."""
    if ERROR_COL not in df.columns:
        return df
    return df.withColumn(ERROR_COL, F.map_filter(F.col(ERROR_COL), lambda k, v: k != F.lit(path)))


def missing(df: DataFrame, path: str) -> Column:
    """missing(path): true when the field is absent from the schema —
    a STATIC property per DataFrame (schema is fixed), unlike the
    reference where it is per-value (context.go:494)."""
    from zed_spark.schema import has_path

    return F.lit(not has_path(df.schema, path))


def strip_errors(df: DataFrame) -> DataFrame:
    """Drop the hidden error column (end-of-pipeline cleanup)."""
    return df.drop(ERROR_COL) if ERROR_COL in df.columns else df
