"""Output formats / sinks (reference: zio output side of
anyio/lookup.go, zio/emitter/, cli/outputflags).

The reference's format list maps onto df.write; `table`/`text`
render driver-side (they are terminal display formats). The
`emitter/dir` split-by-type behavior maps to partitionBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_record_stream(df: DataFrame, fmt: str) -> None:
    """Columnar writers (parquet/arrows) accept only a uniform record
    stream (zio/parquetio/writer.go, zio/arrowio/writer.go ztests
    writer-errors): reject bare values, empty records, mixed shapes
    (per the presence sidecar), and — parquet only — types the format
    can't carry (duration, float16, per the type sidecar)."""
    io = {"parquet": "parquetio", "arrows": "arrowio"}.get(fmt, fmt)
    vis = [c for c in df.columns if not c.startswith("__zed_")]
    if vis == ["this"]:
        raise ValueError(f"{io}: not a record")
    if not vis:
        raise ValueError(f"{io}: unsupported type: empty record")
    if "__zed_missing" in df.columns:
        shapes = {
            tuple(sorted(m for m in (r[0] or []) if "\x00" not in m))
            for r in df.select("__zed_missing").collect()
        }
        if len(shapes) > 1:
            raise ValueError(
                f"{io}: encountered multiple types (consider 'fuse')"
            )
    if fmt == "parquet" and "__zed_types" in df.columns:
        first = df.select("__zed_types").first()
        tmap = dict(first[0]) if first and first[0] else {}
        for p, t in tmap.items():
            if t in ("duration", "float16"):
                raise ValueError(
                    f"{io}: unsupported type: not implemented: "
                    f"support for {t.upper()}"
                )


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
