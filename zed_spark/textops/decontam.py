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

from zed_spark.textops.dedup import normalize_text


_FNV = 1099511628211  # FNV-64 prime (same combine as textops/spans.py)


def _gram_hash_set(df: DataFrame, n: int, text_col: str, id_col: str | None) -> DataFrame:
    """(id?, gh): 64-bit hash of each DISTINCT n-token window per row.

    Hashes each WORD once (xxhash64, staged alongside the word array)
    and combines n consecutive word hashes with integer multiply-adds
    (FNV-64 prime, wrapping long arithmetic) — the string form built
    every window's gram string (n-1 growing concat allocations per
    token) only to hash it right after the explode (round-11; same
    rework as spans._positional_gram_hashes). Membership semantics
    are unchanged: the join already compared 64-bit hashes, only the
    hash function differs. Tail windows shorter than n zip against
    null and come out null, exactly like the string form's overhang;
    array_distinct mirrors shingles_from_words' per-row dedup."""
    keep = [id_col] if id_col else []
    wh = F.col("__wh")
    cur = wh
    for j in range(1, n):
        rest = F.slice(wh, j + 1, F.greatest(F.size(wh) - j, F.lit(0)))
        cur = F.zip_with(cur, rest, lambda a, b: a * _FNV + b)
    cur = F.array_distinct(F.filter(cur, lambda x: x.isNotNull()))
    return (
        df.select(
            *keep, F.split(normalize_text(F.col(text_col)), " ").alias("__w")
        )
        .select(
            *keep, F.transform("__w", lambda w: F.xxhash64(w)).alias("__wh")
        )
        .select(*keep, F.explode(cur).alias("gh"))
    )


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
    # (hashes come straight from the word-hash combine; no gram
    # strings are ever built — see _gram_hash_set)
    eval_grams = _gram_hash_set(
        eval_df, n, eval_text_col or text_col, None
    ).distinct()
    doc_grams = _gram_hash_set(docs, n, text_col, id_col)
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
