"""Large-scale training-data pipeline operators.

Beyond the reference's surface (SURVEY §7.2 step 9): deduplication
(exact, MinHash-LSH, SimHash, n-gram Jaccard, embedding cosine),
ANN similarity search, text analysis (language id, quality scores,
token counts, fingerprints), and multimodal column plumbing.

Design rules for 100 TB:
  - everything is declarative DataFrame ops (codegen'd, shuffle-aware);
  - hashes are md5 (deterministic, available in every engine — keeps
    results reproducible and DuckDB-oracle-checkable);
  - candidate generation (LSH banding) shuffles on band hash — the
    classic way to avoid the O(n²) pair join;
  - no driver-side collects anywhere.
"""

from zed_spark.textops.dedup import exact_dedup, ngram_jaccard_pairs
from zed_spark.textops.minhash import minhash_lsh_pairs, minhash_signature
from zed_spark.textops.simhash import simhash
from zed_spark.textops.similarity import brute_force_topk, cosine_similarity
from zed_spark.textops.analysis import (
    fingerprint,
    language_id,
    quality_score,
    token_count,
    tokenize,
    unigram_logprob_scores,
)
from zed_spark.textops.bpe import bpe_token_count, train_bpe, word_counts
from zed_spark.textops.chunking import chunk_documents
from zed_spark.textops.decontam import contamination_report, decontaminate
from zed_spark.textops.quantize import (
    dequantize_embeddings,
    quantize_embeddings,
    quantized_topk,
)
from zed_spark.textops.spans import duplicated_spans, strip_duplicated_spans

__all__ = [
    "exact_dedup", "ngram_jaccard_pairs",
    "minhash_signature", "minhash_lsh_pairs",
    "simhash",
    "cosine_similarity", "brute_force_topk",
    "tokenize", "token_count", "language_id", "quality_score", "fingerprint",
    "duplicated_spans", "strip_duplicated_spans",
    "contamination_report", "decontaminate",
    "chunk_documents",
    "quantize_embeddings", "dequantize_embeddings", "quantized_topk",
    "train_bpe", "bpe_token_count", "word_counts",
    "unigram_logprob_scores",
]
