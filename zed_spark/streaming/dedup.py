"""Streaming deduplication — the training-data dedup ops on an
unbounded stream.

A batch dedup (textops/dedup.py) re-shuffles the whole corpus per
run; a streaming pipeline dedups incrementally instead:

  - `streaming_exact_dedup`: dropDuplicates on the normalized
    content hash with a watermark — state is bounded to the
    watermark horizon (Spark evicts older keys), which is the only
    sound streaming semantics: an exact duplicate arriving later
    than the watermark is treated as new, a documented trade-off of
    every streaming dedup.
  - `streaming_simhash`: per-document simhash fingerprints computed
    on the stream (stateless — fingerprinting is a map), letting a
    downstream batch job do the near-dup banding over the
    accumulated fingerprint table (the standard lambda split: cheap
    per-event work in the stream, quadratic-candidate work in
    compacted batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from zed_spark.textops.dedup import normalize_text


def streaming_exact_dedup(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Keep the first arrival of each distinct (normalized) content
    within the watermark horizon."""
    hashed = docs.withColumn("content_hash", F.md5(normalize_text(F.col(text_col))))
    return hashed.withWatermark(ts_col, watermark).dropDuplicates(
        ["content_hash"]
    )


def streaming_simhash(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Stateless per-document fingerprints on the stream (the
    banding/candidate join runs downstream in batch)."""
    from zed_spark.textops.simhash import simhash_col

    return docs.withColumn("simhash", simhash_col(F.col(text_col)))


def streaming_incremental_dedup(
    docs: DataFrame,
    signatures: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float | None = 0.5,
) -> DataFrame:
    """Filter a streaming crawl against an already-deduped corpus's
    signature store (textops/incremental.py), entirely STATELESS:
    every per-doc signature (md5, minhashes, band keys, verify
    hash-set) is a pure column expression, and membership tests are
    stream-static anti joins — no watermark, no state store.

    Semantics: drop a stream doc iff it exactly matches a stored
    SHINGLED text (shingle-less texts never cluster, matching the
    batch pipeline) or its verified jaccard against any stored text
    reaches `threshold`. Stream-internal duplicates pass through —
    dedup among the new crawl itself is the batch incremental op's
    job (the standard lambda split, like streaming_simhash above).

    Scale: the exact leg is an equi anti join (shuffle-safe at any
    store size); the near leg needs the banded signature store
    broadcast (arrays_overlap + jaccard is a non-equi condition), so
    it fits stores up to broadcast size — at 100 TB corpus scale run
    the batch incremental op, which shuffles on band keys instead."""
    from zed_spark.textops.dedup import word_shingles
    from zed_spark.textops.incremental import _bands_of_array
    from zed_spark.textops.minhash import P, hash_params, shingle_base

    hs = F.array_distinct(
        F.transform(
            word_shingles(F.col(text_col), k_shingle, sort=False),
            lambda sh: shingle_base(sh),
        )
    )
    def _mh(i: int):
        # closure factory, NOT a two-arg lambda: pyspark passes the
        # array INDEX to transform lambdas of arity 2, clobbering a
        # default-bound seed
        a, b = hash_params(i)
        return F.array_min(
            F.transform(F.col("__hs"), lambda h: (F.lit(a) * h + F.lit(b)) % P)
        )

    minh = F.array(*[_mh(i) for i in range(num_hashes)])
    staged = docs.withColumn("__h", F.md5(F.col(text_col))).withColumn(
        "__hs", hs
    ).withColumn("minhashes", minh)
    band_key = [
        F.concat_ws(":", F.lit(i), b.cast("string"))
        for i, b in enumerate(_bands_of_array(num_hashes, bands))
    ]
    staged = staged.withColumn(
        "__bk",
        F.when(F.size("__hs") > 0, F.array(*band_key)).otherwise(
            F.array().cast("array<string>")
        ),
    )

    shingled_store = signatures.filter(F.col("minhashes").isNotNull())
    exact_store = shingled_store.select("__h")
    near_store = shingled_store.select(
        F.array(
            *[
                F.concat_ws(":", F.lit(i), b.cast("string"))
                for i, b in enumerate(_bands_of_array(num_hashes, bands))
            ]
        ).alias("__sbk"),
        F.col("hashset").alias("__shs"),
    )

    out = staged.join(exact_store, "__h", "left_anti")
    cond = F.arrays_overlap(F.col("__bk"), F.col("__sbk"))
    if threshold is not None:
        common = F.size(F.array_intersect(F.col("__hs"), F.col("__shs")))
        jac = common / (F.size("__hs") + F.size("__shs") - common)
        cond = cond & (jac >= threshold)
    out = out.join(F.broadcast(near_store), cond, "left_anti")
    return out.drop("__h", "__hs", "minhashes", "__bk")


def streaming_decontaminate(
    docs: DataFrame,
    eval_df: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_text_col: str | None = None,
) -> DataFrame:
    """Drop stream docs sharing any n-gram with a STATIC eval set —
    the streaming face of textops/decontam.decontaminate(min_hits=1),
    stateless like streaming_incremental_dedup: the doc's gram-hash
    array is a pure column expression and membership is one
    stream-static broadcast left-anti join (condition:
    array_contains(doc grams, eval gram)). The eval side is
    benchmark-sized by definition, so the broadcast is the same one
    the batch op plans. min_hits > 1 needs per-doc hit counting
    (an aggregation) — that is the batch op's job."""
    from zed_spark.textops.dedup import word_shingles

    grams = F.transform(
        word_shingles(F.col(text_col), n, sort=False), lambda g: F.xxhash64(g)
    )
    ev = (
        eval_df.select(
            F.explode(
                word_shingles(F.col(eval_text_col or text_col), n, sort=False)
            ).alias("__g")
        )
        .select(F.xxhash64("__g").alias("__egh"))
        .distinct()
    )
    staged = docs.withColumn("__gh", grams)
    out = staged.join(
        F.broadcast(ev),
        F.array_contains(F.col("__gh"), F.col("__egh")),
        "left_anti",
    )
    return out.drop("__gh")
