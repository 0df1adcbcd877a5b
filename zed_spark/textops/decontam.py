"""Benchmark decontamination: drop training docs that overlap an
evaluation set.

The standard pre-training hygiene step (GPT-3 appendix C / PaLM-style
n-gram collision): a training doc is contaminated when it shares at
least `min_hits` distinct n-token grams with any benchmark doc.

Scale design: the eval side is benchmark-sized (MBs), the training
side is the 100 TB corpus — so the eval gram set is DISTINCT-reduced
and BROADCAST, and the corpus-side plan is explode → broadcast hash
join → partial count per doc. The corpus is never shuffled by gram;
the only wide exchange is the per-doc hit count (keyed on doc id),
and the final cleanse is a left-anti join on id. Nothing collects to
the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from zed_spark.textops.dedup import normalize_text, shingles_from_words


def _gram_set(df: DataFrame, n: int, text_col: str, id_col: str | None) -> DataFrame:
    # sort=False: membership counting is order-insensitive, so the
    # per-doc O(m log m) shingle sort is pure overhead here.
    # Words staged in their own projection: inlined, the k=5 zip_with
    # chain carried NINE split(regexp_replace(...)) copies (round-11
    # plan audit) — one regexp per row suffices. The gram chain stays
    # inline in the explode (attribute children trigger
    # InferFiltersFromGenerate + pushdown re-inlining — see
    # dedup.shingles_from_words).
    keep = [id_col] if id_col else []
    ex = df.select(
        *keep, F.split(normalize_text(F.col(text_col)), " ").alias("__w")
    ).select(
        *keep,
        F.explode(shingles_from_words(F.col("__w"), k=n, sort=False)).alias("gram"),
    )
    return ex


def contamination_report(
    docs: DataFrame,
    eval_df: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_text_col: str | None = None,
) -> DataFrame:
    """(id, n_hits): distinct n-grams of each training doc that also
    appear anywhere in the eval set. Docs with zero hits are absent.

    The eval gram set deduplicates across ALL benchmark docs before
    broadcasting — overlap with two eval docs on the same gram is one
    hit, matching the distinct-collision definition."""
    # join on the 8-byte codegen hash, not the gram string — the
    # broadcast set is ~4x smaller and probing is a long compare
    eval_grams = (
        _gram_set(eval_df, n, eval_text_col or text_col, None)
        .select(F.xxhash64("gram").alias("gh"))
        .distinct()
    )
    doc_grams = _gram_set(docs, n, text_col, id_col).select(
        id_col, F.xxhash64("gram").alias("gh")
    )
    return (
        doc_grams.join(F.broadcast(eval_grams), "gh")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


def decontaminate(
    docs: DataFrame,
    eval_df: DataFrame,
    n: int = 8,
    min_hits: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_text_col: str | None = None,
) -> DataFrame:
    """The cleansed corpus: training docs minus every doc whose
    distinct n-gram overlap with the eval set reaches `min_hits`."""
    bad = contamination_report(
        docs, eval_df, n=n, text_col=text_col, id_col=id_col,
        eval_text_col=eval_text_col,
    ).where(F.col("n_hits") >= min_hits).select(id_col)
    return docs.join(bad, id_col, "left_anti")
