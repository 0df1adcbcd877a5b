"""Text analysis: tokenization, token counts, language id, quality
scores, document fingerprints. All native column expressions —
per-row, no shuffle, runs at scan speed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from zed_spark.textops.dedup import normalize_text

# small multilingual stopword lists for the n-gram/stopword language
# heuristic (public common-word lists)
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it", "that", "for"],
    "es": ["el", "la", "de", "que", "y", "en", "un", "una", "los", "por"],
    "fr": ["le", "la", "de", "et", "un", "une", "les", "des", "que", "pour"],
    "de": ["der", "die", "das", "und", "ein", "eine", "zu", "von", "mit", "ist"],
}

# BPE-ish token heuristic: word pieces + digits + punctuation runs
_TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokenize(text: Column) -> Column:
    """Whitespace tokenization of normalized text."""
    return F.split(normalize_text(text), " ")


def token_count(text: Column, mode: str = "whitespace") -> Column:
    """mode='whitespace': word count. mode='bpe': BPE-ish regex token
    count (letters runs + digit runs + single punctuation) — a cheap
    proxy for subword token counts."""
    if mode == "whitespace":
        return F.size(tokenize(text))
    if mode == "bpe":
        return F.size(F.regexp_extract_all(text, F.lit(_TOKEN_REGEX), 0))
    raise ValueError(f"token_count mode {mode!r}")


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    toks = tokenize(text)
    stops = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stops, t)))
    return n_stop / F.greatest(F.size(toks), F.lit(1))


def language_id(text: Column) -> Column:
    """Heuristic language id: the language whose stopword hit-ratio is
    highest; 'und' when no stopwords hit at all."""
    ratios = [(lang, stopword_ratio(text, lang)) for lang in STOPWORDS]
    best_ratio = F.greatest(*[r for _, r in ratios])
    out = F.lit("und")
    for lang, r in ratios:
        out = F.when((best_ratio > 0) & (r == best_ratio), F.lit(lang)).otherwise(out)
    return out


def quality_score(text: Column) -> Column:
    """Composite quality score in [0,1]: length score × alpha ratio ×
    stopword presence × mean-word-length sanity. The standard cheap
    pre-filter in training-data pipelines (C4-style heuristics).
    """
    toks = tokenize(text)
    n_words = F.size(toks)
    n_chars = F.length(text)
    mean_wl = n_chars / F.greatest(n_words, F.lit(1))
    len_score = F.least(n_words / F.lit(50.0), F.lit(1.0))
    alpha_ratio = F.length(F.regexp_replace(text, r"[^A-Za-z\s]", "")) / F.greatest(
        n_chars, F.lit(1)
    )
    wl_score = F.when((mean_wl >= 2) & (mean_wl <= 12), 1.0).otherwise(0.5)
    stop_score = F.when(stopword_ratio(text) > 0, 1.0).otherwise(0.7)
    return F.round(len_score * alpha_ratio * wl_score * stop_score, 6)


def fingerprint(text: Column, n_chars: int = 16) -> Column:
    """Deterministic document fingerprint: md5 of normalized text
    (prefix). For shift-robust fingerprints use simhash.simhash."""
    return F.substring(F.md5(normalize_text(text)), 1, n_chars)


def quality_report(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per doc with the full analysis column set."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        token_count(t).alias("n_words"),
        token_count(t, "bpe").alias("n_tokens"),
        F.length(t).alias("n_chars"),
        language_id(t).alias("lang_guess"),
        F.round(stopword_ratio(t), 6).alias("stopword_ratio"),
        quality_score(t).alias("quality"),
        fingerprint(t).alias("fingerprint"),
    )


def unigram_logprob_scores(
    df: DataFrame,
    lm_df: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    oov_logprob: float | None = None,
) -> DataFrame:
    """CCNet-style language-model quality signal: mean per-token
    unigram log-probability (natural log) of each doc under a word
    LM. Low scores flag gibberish/boilerplate; pipelines keep the
    middle of the distribution.

    `lm_df` is a (word, n) frequency table — train it on a trusted
    corpus (bpe.word_counts) or pass None to self-train on `df`
    (perplexity-vs-own-corpus, the common first pass). Unseen words
    score `oov_logprob` (default: log of one pseudo-count under the
    LM total — add-one style).

    Scale: the LM is vocabulary-sized, so it BROADCASTS; the corpus
    side is explode -> broadcast hash join -> per-doc mean. One
    shuffle keyed on doc id. Empty docs score NULL."""
    from zed_spark.textops.bpe import word_counts

    if lm_df is None:
        lm_df = word_counts(df, text_col=text_col)
    total = lm_df.agg(F.sum("n")).first()[0] or 1
    if oov_logprob is None:
        import math

        oov_logprob = math.log(1.0 / (total + 1))
    lm = lm_df.select(
        "word", F.log(F.col("n") / F.lit(float(total))).alias("__lp")
    )
    toks = df.select(
        id_col, F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("word")
    ).where(F.col("word") != "")
    scored = toks.join(F.broadcast(lm), "word", "left").select(
        id_col, F.coalesce(F.col("__lp"), F.lit(float(oov_logprob))).alias("__lp")
    )
    return scored.groupBy(id_col).agg(F.avg("__lp").alias("mean_logprob"))
