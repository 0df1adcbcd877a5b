"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — exact, one pass, the right
answer up to ~10^7 corpus rows per query batch.

Scale path: sign-LSH (random-hyperplane) bucketing — deterministic
hyperplanes derived from md5 so results are reproducible; candidate
set = same-bucket rows, re-ranked exactly. This is IVF-flat-like
behavior with zero external deps.

All vector math is native higher-order functions (zip_with /
aggregate) computed in double — stays in codegen, no Python.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine against one query vector.

    The literal query vector is inlined into the plan (broadcast by
    value); Catalyst executes scan → per-row dot product →
    TakeOrderedAndProject (per-partition heap + driver merge of k).
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    sim = cosine_similarity(F.col(vec_col), q).alias("cosine")
    return (
        corpus.select(F.col(id_col), sim)
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
    )


def pairwise_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k corpus neighbors for EVERY query row (small query
    set × large corpus): broadcast the queries, window-rank per
    query. The corpus never shuffles — only the k results per query."""
    from pyspark.sql import Window

    q = F.broadcast(
        queries.select(F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"))
    )
    joined = corpus.crossJoin(q).select(
        "q_id",
        F.col(id_col).alias("c_id"),
        cosine_similarity(F.col(vec_col), F.col("q_vec")).alias("cosine"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("c_id"))
    return joined.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


# --- sign-LSH bucketing (the ANN scale path) -------------------------------


def _hyperplane(seed: int, dim: int) -> list[float]:
    """Deterministic pseudo-random unit hyperplane from md5(seed,i) —
    reproducible across engines and runs, no RNG state."""
    import hashlib

    vals = []
    for i in range(dim):
        h = hashlib.md5(f"{seed}:{i}".encode()).hexdigest()
        # map 8 hex chars to [-1, 1)
        vals.append(int(h[:8], 16) / 2**31 - 1.0)
    n = math.sqrt(sum(v * v for v in vals)) or 1.0
    return [v / n for v in vals]


def lsh_bucket(vec: Column, dim: int, n_planes: int = 8) -> Column:
    """Sign-LSH bucket id: bitstring of hyperplane sign bits."""
    bits = []
    for p in range(n_planes):
        plane = F.array(*[F.lit(v) for v in _hyperplane(p, dim)])
        bits.append(F.when(dot(vec, plane) >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def embedding_near_pairs(
    corpus: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs.

    n_planes=None → exact all-pairs (self-join on id<id) — right up
    to ~10^5 rows per executor-group; n_planes=k → sign-LSH bucketed:
    only same-bucket pairs are compared (the 100 TB path: expected
    bucket size n/2^k bounds the quadratic term; near-identical
    vectors land in the same bucket with prob ≈ 1 - k·θ/π).

    Normalized vectors are precomputed once (cached) so the pair
    join computes a plain dot product.
    """
    dim = len(corpus.select(vec_col).first()[0])
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = corpus.select(
        F.col(id_col).alias("id"), v.alias("u")
    ).withColumn("nrm", norm(F.col("u")))
    if n_planes:
        base = base.withColumn("bucket", lsh_bucket(F.col("u"), dim, n_planes))
    base = base.cache()
    a, b = base.alias("a"), base.alias("b")
    cond = F.col("a.id") < F.col("b.id")
    if n_planes:
        cond = cond & (F.col("a.bucket") == F.col("b.bucket"))
    sim = dot(F.col("a.u"), F.col("b.u")) / (F.col("a.nrm") * F.col("b.nrm"))
    return (
        a.join(b, cond)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            sim.alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def ann_topk(
    corpus: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
) -> DataFrame:
    """ANN top-k: prune to the query's LSH bucket, rank exactly.

    At 100 TB the bucket filter is a partition-prunable predicate if
    the corpus is written partitioned by bucket (see sources.lake);
    recall is tuned with n_planes (fewer planes → bigger buckets).
    """
    dim = len(query_vec)
    bucket = lsh_bucket(F.array(*[F.lit(float(x)) for x in query_vec]), dim, n_planes)
    candidates = corpus.filter(lsh_bucket(F.col(vec_col), dim, n_planes) == bucket)
    return brute_force_topk(candidates, query_vec, k, id_col, vec_col)
