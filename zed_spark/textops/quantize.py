"""Embedding quantization: symmetric int8 storage for ANN at scale.

A 256-dim float32 embedding is 1 KB; its int8 form is 260 bytes
(vector + one float scale). At 10^10 vectors that is the difference
between 10 TB and 2.6 TB of index — the standard storage/recall
trade every large ANN deployment makes (IVF-SQ8 et al.).

Everything is a per-row codegen expression (transform/aggregate) —
no shuffle, no UDF, prunable at the scan. Rounding is written as
floor(x + 0.5) explicitly so the quantized values are deterministic
and engine-portable (SQL round() half-away/half-even semantics vary;
floor does not) — which keeps the op exactly DuckDB-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scale_expr(emb: Column) -> Column:
    """Per-vector symmetric scale: max|x| / 127 (guarded for the
    all-zero vector)."""
    mx = F.array_max(F.transform(emb, lambda x: F.abs(x.cast("double"))))
    return F.greatest(mx, F.lit(1e-30)) / 127.0


def quantize_embeddings(
    df: DataFrame,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, scale, qvec): symmetric int8 quantization — qvec[i] =
    floor(x[i]/scale + 0.5), clamped to [-127, 127]."""
    scaled = df.withColumn("__s", _scale_expr(F.col(emb_col)))
    q = F.transform(
        F.col(emb_col),
        lambda x: F.greatest(
            F.lit(-127),
            F.least(
                F.lit(127),
                F.floor(x.cast("double") / F.col("__s") + 0.5).cast("int"),
            ),
        ),
    )
    return scaled.select(
        id_col, F.col("__s").alias("scale"), q.alias("qvec")
    )


def quantized_topk(
    df: DataFrame,
    query: list[float],
    k: int = 10,
    qvec_col: str = "qvec",
    scale_col: str = "scale",
    id_col: str = "vec_id",
) -> DataFrame:
    """Brute-force cosine top-k over QUANTIZED vectors: the dot
    product folds the scale out — dot(x~, q) = scale * sum(qvec_i *
    query_i) — so scoring never materializes float vectors. One
    codegen aggregate per row + TakeOrderedAndProject; the int8 store
    is the only thing scanned."""
    import math

    qn = math.sqrt(sum(x * x for x in query)) or 1.0
    qarr = F.array(*[F.lit(float(x)) for x in query])
    dot = F.aggregate(
        F.zip_with(F.col(qvec_col), qarr, lambda a, b: a.cast("double") * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    ) * F.col(scale_col)
    norm = F.sqrt(
        F.aggregate(
            F.transform(F.col(qvec_col), lambda a: a.cast("double") * a.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    ) * F.col(scale_col)
    cos = F.when(norm > 0, dot / (norm * qn)).otherwise(F.lit(0.0))
    return (
        df.select(id_col, cos.alias("cosine"))
        .orderBy(F.desc("cosine"), id_col)
        .limit(k)
    )


def dequantize_embeddings(
    df: DataFrame,
    qvec_col: str = "qvec",
    scale_col: str = "scale",
    out_col: str = "embedding",
) -> DataFrame:
    """Reconstruct float vectors: x~[i] = qvec[i] * scale. Max
    per-element error is scale/2 = max|x|/254."""
    return df.withColumn(
        out_col,
        F.transform(F.col(qvec_col), lambda q: q.cast("double") * F.col(scale_col)),
    )
