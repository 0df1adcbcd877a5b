"""Arrow IPC input/output — the reference's `arrows` format.

Reference: zio/arrowio/ (reader.go/writer.go) reads and writes the
Arrow IPC *stream* format, registered in the format dispatch at
zio/anyio/lookup.go:24-56 under "arrows". Here the analog is nearly
free: Spark's Python interchange is already Arrow, so reading is one
IPC decode per file straight into `mapInArrow` (record batches pass
through untouched — no pandas, no per-row work), and writing reuses
the same Arrow batches Spark produces.

Scale notes:
  - Arrow IPC is not block-splittable (unlike parquet), so the unit
    of parallelism is the FILE — one task per file via the
    `binaryFile` source. A directory of N files reads N-wide. This
    matches the reference, which also streams one file sequentially.
  - The driver touches only the FIRST file's header (schema); all
    batch decoding happens in executors.
  - Directory writes emit one .arrows file per partition from inside
    the executors (no driver collect); `single_file=True` is the
    driver-side `df.toArrow()` path, for small exports only.
"""

from __future__ import annotations

import io
import os

from pyspark.sql import DataFrame, SparkSession


def _open_ipc(buf: bytes):
    """IPC reader for stream- or file-format bytes (the reference
    accepts the stream form; we tolerate both)."""
    import pyarrow as pa

    try:
        return pa.ipc.open_stream(io.BytesIO(buf))
    except pa.ArrowInvalid:
        return pa.ipc.open_file(io.BytesIO(buf))


def _iter_batches(reader):
    import pyarrow as pa

    if isinstance(reader, pa.ipc.RecordBatchFileReader):
        for i in range(reader.num_record_batches):
            yield reader.get_batch(i)
    else:
        yield from reader


def read_arrows(spark: SparkSession, path: str) -> DataFrame:
    """Read Arrow IPC file(s) → DataFrame. `path` may be a file, a
    directory, or a glob; each file is one task."""
    from pyspark.sql.pandas.types import from_arrow_schema

    from zed_spark.sources import fsio

    files = [
        f
        for f in fsio.expand(path)
        if not fsio.basename(f).startswith(("_", "."))
    ]
    if not files:
        raise ValueError(f"{path}: no Arrow files found")
    arrow_schema = _open_ipc(fsio.read_bytes(files[0])).schema
    spark_schema = from_arrow_schema(arrow_schema)

    bin_df = spark.read.format("binaryFile").load(files).select("content")

    def decode(batches):
        for b in batches:
            for content in b.column(0).to_pylist():
                rdr = _open_ipc(content)
                for rb in _iter_batches(rdr):
                    yield rb

    return bin_df.mapInArrow(decode, spark_schema)


def write_arrows(df: DataFrame, path: str, single_file: bool = False) -> None:
    """Write a DataFrame as Arrow IPC stream file(s).

    Default: one `part-N.arrows` per partition, written inside the
    executors (batches never cross to the driver). single_file=True
    collects via `df.toArrow()` — small exports only.
    """
    import pyarrow as pa

    from zed_spark.sources import fsio

    if fsio.is_uri(path):
        path = fsio.normalize_uri(path)
        fsio.check_executor_fs(path)  # plan-time scheme probe
    if single_file:
        table = df.toArrow()
        if fsio.is_dir(path):
            path = fsio.join(path, "part-0.arrows")
        with fsio.open_output(path) as sink:
            with pa.ipc.new_stream(sink, table.schema) as w:
                w.write_table(table)
        return

    fsio.makedirs(path)

    def write_part(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        out = fsio.join(path, f"part-{pid:05d}.arrows")
        writer = None
        sink = None
        try:
            for b in batches:
                if writer is None:
                    # part files open inside the executors through
                    # pyarrow.fs (URIs) or plain open (local) — the
                    # reference's scheme-routed storage engine
                    # (pkg/storage/s3.go:11-34), worker-side
                    sink = fsio.open_output(out)
                    writer = pa.ipc.new_stream(sink, b.schema)
                writer.write_batch(b)
        finally:
            if writer is not None:
                writer.close()
            if sink is not None:
                sink.close()
        if False:
            yield  # generator with no output rows

    df.mapInArrow(write_part, df.schema).count()
