"""BPE vocabulary induction over a corpus.

Byte-pair-encoding training (Sennrich et al. 2016, arXiv:1508.07909)
— the tokenizer-construction step of a pretraining pipeline. The
algorithm is inherently sequential in its merge choices, but its
input is not the corpus: it is the WORD-FREQUENCY table, which is
bounded by vocabulary size (~10^5-10^6 rows at any corpus scale).
So the Spark-first split is:

  1. distributed word counting — one shuffle with map-side partial
     counts; optionally truncated to the top `max_words` words by
     frequency (the long tail contributes negligible pair mass);
  2. the classic merge loop DRIVER-SIDE over the word-frequency
     dict: repeatedly merge the most frequent adjacent symbol pair
     (ties broken lexicographically for determinism).

This is exactly how production tokenizer trainers consume large
corpora (word counts in, merges out); the 100 TB part of the job is
step 1, and it is one aggregation.

`bpe_token_count` applies a trained merge list with a vectorized
pandas UDF — encoding is per-word and cache-friendly (words repeat,
so an LRU per batch collapses the work to the distinct words).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from zed_spark.textops.dedup import normalize_text


def word_counts(
    df: DataFrame, text_col: str = "text", max_words: int | None = None
) -> DataFrame:
    """(word, n) over the normalized corpus — the bounded input BPE
    training actually needs. One shuffle, map-side partials."""
    out = (
        df.select(
            F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("word")
        )
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if max_words:
        out = out.orderBy(F.desc("n"), "word").limit(max_words)
    return out


def _train_merges(freqs: dict[str, int], n_merges: int) -> list[tuple[str, str]]:
    """Classic BPE merge loop over a word-frequency dict. Words are
    symbol tuples (chars + </w> end marker); each round merges the
    (count, lexicographic) best adjacent pair. Deterministic."""
    words = {tuple(w) + ("</w>",): n for w, n in freqs.items()}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for sym, n in words.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + n
        if not pairs:
            break
        # determinism: highest count, then lexicographically SMALLEST
        top = max(pairs.values())
        if top < 2:
            break
        best_pair = min(p for p, n in pairs.items() if n == top)
        merges.append(best_pair)
        a, b = best_pair
        ab = a + b
        new_words: dict[tuple, int] = {}
        for sym, n in words.items():
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_words[tuple(out)] = new_words.get(tuple(out), 0) + n
        words = new_words
    return merges


def train_bpe(
    df: DataFrame,
    n_merges: int = 100,
    text_col: str = "text",
    max_words: int = 200_000,
) -> list[tuple[str, str]]:
    """Train a BPE merge list: ONE distributed word-count aggregation
    (bounded to the top `max_words` words), then the sequential merge
    loop on the driver over that bounded table. Returns the ordered
    merge list."""
    freqs = {
        r["word"]: r["n"]
        for r in word_counts(df, text_col, max_words=max_words).collect()
    }
    return _train_merges(freqs, n_merges)


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> int:
    """Number of BPE tokens for one word under the trained merges."""
    sym = list(word) + ["</w>"]
    while len(sym) > 1:
        best_rank, best_i = None, None
        for i, (a, b) in enumerate(zip(sym, sym[1:])):
            r = ranks.get((a, b))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_i is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return len(sym)


def bpe_token_count(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_tokens): per-doc token count under a trained merge
    list. A vectorized pandas UDF encodes each DISTINCT word once
    per batch (words repeat heavily, so the per-batch cache collapses
    the work); merges broadcast with the closure."""
    from pyspark.sql.functions import pandas_udf

    ranks = {tuple(m): i for i, m in enumerate(merges)}

    @pandas_udf("long")
    def count_tokens(texts: pd.Series) -> pd.Series:
        cache: dict[str, int] = {}

        def one(t):
            if t is None:
                return 0
            total = 0
            for w in t.split():
                got = cache.get(w)
                if got is None:
                    got = cache[w] = _encode_word(w, ranks)
                total += got
            return total

        return texts.map(one)

    norm = normalize_text(F.col(text_col))
    return df.select(id_col, count_tokens(norm).alias("n_tokens"))
