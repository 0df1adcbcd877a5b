"""Output formats / sinks (reference: zio output side of
anyio/lookup.go, zio/emitter/, cli/outputflags).

The reference's format list maps onto df.write; `table`/`text`
render driver-side (they are terminal display formats). The
`emitter/dir` split-by-type behavior maps to partitionBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_any(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    **options,
) -> None:
    """fmt: parquet | json (ndjson) | csv | text | orc."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if fmt == "parquet":
        w.options(**options).parquet(path)
    elif fmt == "json":
        w.options(**options).json(path)
    elif fmt == "csv":
        options.setdefault("header", True)
        w.options(**options).csv(path)
    elif fmt == "text":
        w.options(**options).text(path)
    elif fmt == "orc":
        w.options(**options).orc(path)
    elif fmt == "arrows":
        from zed_spark.sources.arrow_io import write_arrows

        write_arrows(df, path, **options)
    elif fmt == "zeek":
        from zed_spark.sources.zeek import write_zeek

        write_zeek(df, path)
    else:
        raise ValueError(f"unknown sink format {fmt!r}")


def to_table_string(df: DataFrame, n: int = 20) -> str:
    """The reference's `table` output format: aligned text rendering
    (driver-side; display format, not a storage sink)."""
    return df._jdf.showString(n, 0, False)


def emit_split_by(df: DataFrame, path: str, column: str, fmt: str = "parquet") -> None:
    """emitter/dir behavior: one output directory per value of a
    column (the reference splits by type; any low-cardinality column
    works) — partitioned write, no driver loop."""
    write_any(df, path, fmt=fmt, partition_by=[column])
