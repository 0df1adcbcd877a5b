"""File readers — the engine's input formats.

Reference format dispatch: zio/anyio/lookup.go:24-56 (arrows, csv,
json, line, parquet, tsv, zeek, …). Our binary columnar format IS
parquet (the reference's VNG spec, docs/formats/vng.md, explicitly
compares itself to parquet); ZNG binary and ZSON/ZJSON text are read natively; VNG is not ported.

Formats here:
  parquet   — spark.read.parquet (pushdown + pruning)
  json      — ndjson with schema inference or explicit schema
  csv / tsv — header + type inference options
  line      — one string column `value` (zio/lineio)
  zeek      — zeek TSV logs with '#fields'/'#types' headers
              (zio/zeekio): parsed into typed columns
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# tables whose parquet files carry TIMESTAMP(NANOS) — Spark reads them
# as LongType ns (legacy nanosAsLong); convert to µs TimestampType.
_NS_TS_COLS = {"events": ["ts"]}


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # set defensively at runtime: a caller-provided session (e.g. the
    # round driver's) may lack both; without nanosAsLong the events
    # scan fails with PARQUET_TYPE_ILLEGAL on TIMESTAMP(NANOS), and a
    # non-UTC session TZ shifts date extraction vs the DuckDB oracle
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name in _NS_TS_COLS:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in _NS_TS_COLS.get(name, []):
        if c in df.columns and isinstance(df.schema[c].dataType, T.LongType):
            # integer division: ns are ~2^60, double division would
            # lose precision before the floor
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    return df


def read_any(spark: SparkSession, path: str, fmt: str = "auto", **options) -> DataFrame:
    if fmt == "auto":
        fmt = _sniff_format(path)
    if fmt == "parquet":
        return spark.read.parquet(path)
    if fmt == "json":
        return spark.read.options(**options).json(path)
    if fmt == "csv":
        options.setdefault("header", True)
        options.setdefault("inferSchema", True)
        return spark.read.options(**options).csv(path)
    if fmt == "tsv":
        options.setdefault("header", True)
        options.setdefault("inferSchema", True)
        options.setdefault("sep", "\t")
        return spark.read.options(**options).csv(path)
    if fmt == "line":
        return spark.read.text(path)
    if fmt == "zeek":
        return read_zeek_tsv(spark, path)
    if fmt == "zson":
        from zed_spark.sources.zson import read_zson_fused

        return read_zson_fused(spark, path)
    if fmt == "zjson":
        from zed_spark.sources.zjson import read_zjson_fused

        return read_zjson_fused(spark, path)
    if fmt == "arrows":
        from zed_spark.sources.arrow_io import read_arrows

        return read_arrows(spark, path)
    if fmt == "zng":
        from zed_spark.sources.zng import read_zng_fused

        return read_zng_fused(spark, path)
    raise ValueError(f"unknown format {fmt!r}")


_EXT_FORMATS = [
    (".parquet", "parquet"), (".json", "json"), (".ndjson", "json"),
    (".csv", "csv"), (".tsv", "tsv"), (".log", "zeek"), (".txt", "line"),
    (".zson", "zson"), (".zjson", "zjson"), (".arrows", "arrows"),
    (".arrow", "arrows"), (".zng", "zng"),
]


def _sniff_format(path: str) -> str:
    for ext, fmt in _EXT_FORMATS:
        if path.endswith(ext):
            return fmt
    # extension-less directory (a Spark text/parquet output dir, a
    # lake object, a ZSON export): sniff the first data file's content
    import glob as _glob
    import json as _json
    import os as _os

    if _os.path.isdir(path):
        files = [
            f
            for f in sorted(_glob.glob(_os.path.join(path, "*")))
            if _os.path.isfile(f)
            and not _os.path.basename(f).startswith(("_", "."))
            and not f.endswith(".crc")
        ]
        if files:
            for ext, fmt in _EXT_FORMATS:
                if files[0].endswith(ext) and ext != ".txt":
                    return fmt
            with open(files[0], "rb") as fh:
                head = fh.read(4096)
            if head[:4] == b"PAR1":
                return "parquet"
            if head[:6] == b"ARROW1" or head[:4] == b"\xff\xff\xff\xff":
                # Arrow IPC file magic / stream continuation marker
                return "arrows"
            first = head.decode("utf-8", errors="replace").lstrip().splitlines()
            line = first[0] if first else ""
            if line.startswith("#separator"):
                return "zeek"
            if line.startswith("{"):
                try:
                    obj = _json.loads(line)
                    # ZJSON frames are {"type":..,"value":..} JSON
                    if isinstance(obj, dict) and set(obj) == {"type", "value"}:
                        return "zjson"
                    return "json"
                except ValueError:
                    return "zson"  # records with unquoted names
            return "line"
    return "parquet"


# --- zeek TSV (zio/zeekio) -------------------------------------------------

_ZEEK_TYPES = {
    "time": T.DoubleType(),      # epoch seconds w/ fraction; converted below
    "interval": T.LongType(),    # → int64 ns duration (zeek-compat.md)
    "count": T.LongType(),
    "int": T.LongType(),
    "double": T.DoubleType(),
    "bool": T.StringType(),      # zeek T/F; converted below
    "string": T.StringType(),
    "addr": T.StringType(),
    "port": T.IntegerType(),
    "enum": T.StringType(),
}


def _zeek_unescape(v: str | None) -> str | None:
    """Decode zeek's \\xNN byte escapes (ascii writer escaping):
    escaped bytes join the surrounding text and the result decodes as
    UTF-8 (multi-byte sequences span several escapes)."""
    if v is None or "\\x" not in v:
        return v
    b = bytearray()
    i, n = 0, len(v)
    while i < n:
        if v[i] == "\\" and i + 3 < n and v[i + 1] == "x":
            try:
                b.append(int(v[i + 2 : i + 4], 16))
                i += 4
                continue
            except ValueError:
                pass
        b += v[i].encode("utf-8")
        i += 1
    try:
        return b.decode("utf-8")
    except UnicodeDecodeError:
        return b.decode("latin-1")


def _zeek_unescape_col(c):
    """Escape decode as a Column: cheap JVM guard (contains '\\x')
    around an Arrow-batched UDF so clean strings never leave the JVM."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _un(s):
        return s.map(_zeek_unescape)

    return F.when(c.contains("\\x"), _un(c)).otherwise(c)


def read_zeek_tsv(spark: SparkSession, path: str) -> DataFrame:
    """Read a zeek TSV log: '#fields'/'#types' header lines define the
    schema (reference: zio/zeekio/parser.go). Header is sniffed
    driver-side (first KB of one file); data is read distributed.
    """
    import glob as _glob

    files = sorted(_glob.glob(path)) or [path]
    fields: list[str] = []
    zpath: str | None = None
    ztypes: list[str] = []
    sep = "\t"
    unset = "-"
    with open(files[0], "r", errors="replace") as f:
        for line in f:
            if not line.startswith("#"):
                break
            raw = line[1:].rstrip("\n")
            if raw.startswith("separator"):
                # the '#separator \x09' line itself is space-delimited
                # (zeek ascii writer); accept tab too for tolerance.
                # All later header lines use the DECLARED separator.
                rest = raw[len("separator"):].lstrip(" \t")
                if rest:
                    sep = (
                        rest.encode().decode("unicode_escape")
                        if rest.startswith("\\")
                        else rest
                    )
                continue
            key, _, rest = raw.partition(sep)
            if key == "unset_field":
                unset = rest
            elif key == "path":
                zpath = rest
            elif key == "fields":
                fields = rest.split(sep)
            elif key == "types":
                ztypes = rest.split(sep)
    if not fields:
        raise ValueError(f"{files[0]}: no '#fields' header — not a zeek log")

    schema = T.StructType(
        [T.StructField(n, T.StringType(), True) for n in fields]
    )
    df = (
        spark.read.options(sep=sep, comment="#", nullValue=unset)
        .schema(schema)
        .csv(path)
    )
    if zpath is not None and "_path" not in fields:
        # zeek injects _path from the '#path' header as the leading
        # column (zio/zeekio parser.go; ztest jsonio/format)
        df = df.select(
            F.lit(zpath).alias("_path"),
            *[F.col(f"`{n}`") for n in fields],
        )
    # apply zeek types (backticks: zeek names like id.orig_h are
    # flat column names, not nested paths)
    for name, zt in zip(fields, ztypes):
        c = F.col(f"`{name}`")
        base = zt.split("[", 1)[0]  # vector[...] stays string csv
        if zt.startswith("set["):
            # zed's zeekio canonicalizes set element order
            # (zeek-compat.md; ztest zson/zeek-to-zson)
            df = df.withColumn(name, F.array_sort(F.split(c, ",")))
        elif zt.startswith("vector["):
            df = df.withColumn(name, F.split(c, ","))
        elif base == "time":
            df = df.withColumn(name, c.cast("double").cast("timestamp"))
        elif base == "interval":
            # zeek interval (seconds) → int64 ns duration, the zed
            # duration model (zeek-compat.md interval row)
            df = df.withColumn(
                name, (c.cast("double") * F.lit(1_000_000_000)).cast("long")
            )
        elif base == "bool":
            df = df.withColumn(name, c == "T")
        elif base == "string":
            df = df.withColumn(name, _zeek_unescape_col(c))
        elif base in _ZEEK_TYPES:
            df = df.withColumn(name, c.cast(_ZEEK_TYPES[base]))
    # zed's zeekio nests dotted field names into records
    # (id.orig_h -> id:{orig_h}) — parser.go builds nested types
    from zed_spark.functions.flatten import nest_dotted

    return nest_dotted(df)
