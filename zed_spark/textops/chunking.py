"""Document chunking: split long docs into bounded token windows.

The training-prep step between cleaning and packing: models consume
fixed-length sequences, so each document becomes chunks of at most
`max_tokens` tokens, optionally overlapping (stride < max_tokens
keeps context across boundaries, the typical LM pretraining setup).

Scale: pure per-row codegen — one expression computes the chunk
starts (sequence) and slices the materialized word array; posexplode
fans out. No shuffle, no UDF, no driver state; chunk count per doc
is ceil(n_tokens / stride), so output size is input-proportional.
The word array is materialized ONCE in a sub-projection before the
transform consumes it (the repetition_filter lesson: an expensive
array expression re-evaluated inside element_at/transform lambdas
turns O(n) into O(n·m)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from zed_spark.textops.dedup import normalize_text


def chunk_documents(
    df: DataFrame,
    max_tokens: int = 512,
    stride: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, chunk_id, n_tokens, chunk): token windows of the
    normalized text. chunk_id counts windows per doc from 0; windows
    start every `stride` tokens (default = max_tokens,
    non-overlapping) and the last window may be shorter. Docs whose
    normalized text is empty produce no chunks."""
    if stride is None:
        stride = max_tokens
    if stride <= 0 or max_tokens <= 0:
        raise ValueError("max_tokens and stride must be positive")
    words_df = df.withColumn(
        "__words", F.split(normalize_text(F.col(text_col)), " ")
    )
    n = F.size("__words")
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride))
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            (s / stride).cast("long").alias("chunk_id"),
            F.least(F.lit(max_tokens), n - s).cast("long").alias("n_tokens"),
            F.array_join(F.slice(F.col("__words"), s + 1, max_tokens), " ").alias(
                "chunk"
            ),
        ),
    )
    out = words_df.select(id_col, F.explode(chunks).alias("c")).select(
        id_col,
        F.col("c.chunk_id").alias("chunk_id"),
        F.col("c.n_tokens").alias("n_tokens"),
        F.col("c.chunk").alias("chunk"),
    )
    return out.where(F.col("chunk") != "")
