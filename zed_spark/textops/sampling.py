"""Reproducible corpus sampling and token-budget shard packing.

Two bookkeeping operators every pretraining pipeline runs after
filtering/dedup:

- **Deterministic hash sampling**: keep a row iff a 28-bit
  md5-derived hash of its id lands under rate·2^28. Unlike
  `df.sample()`, the decision is a pure function of the id, so the
  sample is reproducible across runs, engines, and partitionings,
  stable under data appends (old rows never flip), and composable
  (different salts give independent samples). It compiles to a
  single codegen filter — no shuffle, no RNG state, pushable at the
  scan.
- **Shard packing**: assign documents to training shards of ~budget
  tokens via an exclusive running sum over a deterministic order.
  The global form is a single total-order window — fine for
  shard-manifest metadata, serial at corpus scale — so the scale
  path packs WITHIN a partition key (language, source, date bucket):
  one window per group, all groups in parallel, which is how
  training mixtures are laid out anyway (shards are per-domain and
  mixing weights are applied across domains).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_HASH_SPACE = 1 << 28  # md5 7-hex-digit prefix


def hash_bucket(col: Column, salt: str = "") -> Column:
    """28-bit deterministic bucket of a column's string form (the
    same md5-prefix construction the minhash base hash uses, so the
    DuckDB oracle replicates it verbatim)."""
    key = F.concat(col.cast("string"), F.lit(salt)) if salt else col.cast("string")
    return F.conv(F.substring(F.md5(key), 1, 7), 16, 10).cast("long")


def hash_sample(
    df: DataFrame, rate: float, id_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Deterministic sample of ~rate of the rows, decided per id."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    return df.filter(hash_bucket(F.col(id_col), salt) < int(rate * _HASH_SPACE))


def pack_shards(
    df: DataFrame,
    budget: int,
    tokens_col: str = "n_tokens",
    order_col: str = "doc_id",
    by: str | None = None,
    allow_serial: bool = False,
) -> DataFrame:
    """Assign a `shard` id so consecutive documents (in `order_col`
    order) fill ~`budget` tokens per shard: shard = exclusive running
    token sum div budget. A document larger than the budget gets its
    own shard (the running sum just skips past it).

    `by=None` is a TOTAL order — one serial window task, metadata
    scale only, so it is GATED like the engine's other unpartitioned
    windows (the running-agg path refuses them outright): above
    SPARK_GRAFT_PACK_SHARDS_MAX_SERIAL_ROWS (default 1M) it raises
    unless `allow_serial=True`. Pass `by` (language/source/date
    bucket) for the 100 TB path: per-group windows parallelize across
    groups and shards stay domain-pure."""
    if by is None and not allow_serial:
        import os

        gate = int(
            os.environ.get("SPARK_GRAFT_PACK_SHARDS_MAX_SERIAL_ROWS", "1000000")
        )
        # CollectLimit short-circuits: an oversized frame fails after
        # touching a fraction of its input
        if df.limit(gate + 1).count() > gate:
            raise ValueError(
                f"pack_shards(by=None): input exceeds {gate} rows — a "
                f"total order plans ONE serial window task; pass "
                f"by=<group col> for the parallel path, or "
                f"allow_serial=True for metadata-scale manifests"
            )
    part = Window.partitionBy(by) if by else Window.partitionBy()
    w = part.orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = F.sum(tokens_col).over(w) - F.col(tokens_col)
    return df.withColumn("shard", (cum / F.lit(budget)).cast("long"))


def mixture_sample(
    df: DataFrame,
    weights: dict[str, float],
    token_budget: int,
    source_col: str = "source",
    tokens_col: str = "n_tokens",
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Training-mixture construction: sample each source toward
    ~weight_s · token_budget tokens. Per-source rate =
    min(1, weight_s · budget / tokens_s); membership decided by the
    deterministic id hash, so the mixture is reproducible and stable
    under re-runs. Sources missing from `weights` are dropped.

    Scale shape: one partial-agg pass for per-source token totals
    (one row per source), broadcast-joined back, then one codegen
    filter — no driver collect, no shuffle of the data itself."""
    spark = df.sparkSession
    w = spark.createDataFrame(
        list(weights.items()), f"{source_col} string, __w double"
    )
    totals = df.groupBy(source_col).agg(F.sum(tokens_col).alias("__tot"))
    rates = totals.join(F.broadcast(w), source_col).select(
        source_col,
        F.least(
            F.lit(1.0), F.lit(float(token_budget)) * F.col("__w") / F.col("__tot")
        ).alias("__rate"),
    )
    out = df.join(F.broadcast(rates), source_col)
    keep = hash_bucket(F.col(id_col), salt) < (
        F.col("__rate") * F.lit(float(_HASH_SPACE))
    )
    return out.filter(keep).drop("__rate")
