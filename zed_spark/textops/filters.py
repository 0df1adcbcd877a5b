"""Corpus quality filters for pretraining pipelines.

Two families a 100 TB text pipeline runs before anything else:

- **Repetition filters** (the Gopher rules, Rae et al. 2021 §A1.1):
  documents dominated by repeated words / bigrams are boilerplate or
  spam — compute per-document duplicate-word fraction and top-bigram
  coverage and keep documents under the thresholds.
- **PII detection**: count (not extract) e-mail / phone / IPv4
  matches per document so a downstream policy can drop or scrub.

Everything here is built from pyspark.sql.functions higher-order
expressions — whole-stage-codegen JVM execution, zero Python in the
row path, so the filter costs one scan at any scale.  The per-doc
bigram mode is sort + longest-equal-run, O(n log n) WITHIN a
document and shuffle-free — at cluster scale the work parallelizes
per row.  (Query wrappers may add a fan-out repartition when the
input has fewer splits than cores; see queries_text.py.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# shared with queries_text's oracles: normalized word list
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?\d{3}[-. ]\d{3,4}[-. ]\d{4}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def words_of(text: Column) -> Column:
    return F.split(
        F.trim(F.regexp_replace(F.lower(text), r"\s+", " ")), " "
    )


_FNV = 1099511628211  # FNV-64 prime (same combine as textops/spans.py)


def word_hashes_of(words: Column) -> Column:
    """xxhash64 per word — both repetition metrics run on these
    8-byte hashes instead of the word/bigram strings (round-11):
    array_distinct and array_sort over longs beat the string forms
    (no per-gram concat allocation, long compares instead of string
    compares). A 64-bit collision (~1e-19/pair within one document)
    would nudge one doc's metric; the oracle's exact-output compare
    would catch it."""
    return F.transform(words, lambda w: F.xxhash64(w))


def duplicate_word_fraction(
    text: Column,
    words: Column | None = None,
    word_hashes: Column | None = None,
) -> Column:
    """1 - distinct/total over the document's words: ~0 for prose,
    → 1 for `spam spam spam`. Pass `words` (a materialized words_of
    column) or `word_hashes` (a materialized word_hashes_of column;
    preferred — distinct over longs) to share tokenization with
    other metrics."""
    w = word_hashes if word_hashes is not None else (
        words_of(text) if words is None else words
    )
    n = F.size(w)
    return F.when(
        n > 0,
        1.0 - F.size(F.array_distinct(w)).cast("double") / n,
    ).otherwise(F.lit(0.0))


def top_bigram_coverage(
    text: Column,
    words: Column | None = None,
    word_hashes: Column | None = None,
) -> Column:
    """Fraction of the document's words covered by its most frequent
    bigram (Gopher: drop when the top 2-gram covers > 0.20).

    The per-document mode is sort + longest-equal-run — O(n log n)
    inside codegen, NOT the naive O(n²) distinct×filter scan (which
    measured 300× slower on KB documents). With `word_hashes` the
    bigram key is an integer multiply-add of two word hashes and the
    sort orders longs — no per-bigram string is ever built; run
    counting only needs SOME total order grouping equal keys
    adjacently, so the hash order works as well as the lexicographic
    one."""
    if word_hashes is not None:
        wh = word_hashes
        n = F.size(wh)
        grams = F.array_sort(
            F.filter(
                F.zip_with(
                    wh,
                    F.slice(wh, 2, F.greatest(n - 1, F.lit(0))),
                    lambda a, b: a * _FNV + b,
                ),
                lambda x: x.isNotNull(),
            )
        )
        acc0 = F.struct(
            F.lit(None).cast("bigint").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        )
    else:
        w = words_of(text) if words is None else words
        n = F.size(w)
        grams = F.array_sort(
            F.transform(
                F.sequence(F.lit(0), n - 2),
                lambda i: F.concat_ws(
                    " ", F.element_at(w, i + 1), F.element_at(w, i + 2)
                ),
            )
        )
        acc0 = F.struct(
            F.lit("").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        )

    def step(acc, x):
        run = (
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        )
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    mode_count = F.aggregate(grams, acc0, step, lambda acc: acc["best"])
    # the run counts OVERLAPPING occurrences, so degenerate docs
    # ('a a a' → run 2 over 3 words) can push 2·run/n past 1.0 —
    # clamp: "coverage" is a fraction of the document by definition
    return F.when(
        n >= 2,
        F.least((mode_count * 2).cast("double") / n, F.lit(1.0)),
    ).otherwise(F.lit(0.0))


def repetition_report(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_dup_word_frac: float = 0.5,
    max_top_bigram_cov: float = 0.5,
) -> DataFrame:
    """Per-document repetition metrics + keep decision.

    Tokenization (lower + regexp + split + per-word xxhash64) is
    materialized ONCE in a sub-projection and both metrics read the
    hash array — Catalyst keeps it un-inlined through CollapseProject
    because it is a non-cheap expression used twice (round-11: −25%
    wall at sf1, where this key is CPU-bound on 32 saturated cores).
    Both metrics run on the 8-byte word hashes (see word_hashes_of):
    distinct/sort/compare over longs, no bigram strings."""
    t = F.col(text_col)
    staged = df.select(
        F.col(id_col), word_hashes_of(words_of(t)).alias("__wh")
    )
    dup = duplicate_word_fraction(t, word_hashes=F.col("__wh"))
    cov = top_bigram_coverage(t, word_hashes=F.col("__wh"))
    return staged.select(
        F.col(id_col),
        F.round(dup, 4).alias("dup_word_frac"),
        F.round(cov, 4).alias("top_bigram_cov"),
        (
            (dup <= max_dup_word_frac) & (cov <= max_top_bigram_cov)
        ).alias("keep"),
    )


def pii_report(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document PII match COUNTS (detection, not extraction —
    the payloads never leave the row)."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.regexp_count(t, F.lit(EMAIL_RE)).alias("n_email"),
        F.regexp_count(t, F.lit(PHONE_RE)).alias("n_phone"),
        F.regexp_count(t, F.lit(IPV4_RE)).alias("n_ipv4"),
    ).withColumn(
        "has_pii",
        (F.col("n_email") + F.col("n_phone") + F.col("n_ipv4")) > 0,
    )
