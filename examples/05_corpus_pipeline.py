"""The full pretraining-corpus pipeline, end to end.

Chains every corpus op the engine provides in the order a real
pipeline runs them:

  0. profile                      (describe pass: nulls/distincts)
  1. quality + repetition filter  (Gopher-style rules, codegen)
  2. corpus dedup                 (exact + MinHash-LSH clusters)
  3. benchmark decontamination    (n-gram collision, broadcast)
  4. duplicated-span removal      (exact substring dedup)
  5. chunking                     (bounded token windows)
  6. deterministic sampling       (hash of id, append-stable)
  7. shard packing                (token budget per language)
  8. tokenizer induction          (BPE merges + real token counts)

Run: python examples/05_corpus_pipeline.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def run_pipeline(spark, sf, show=True):
    """Returns {stage: DataFrame} so tests can assert on every step."""
    from zed_spark.analytics import profile_table
    from zed_spark.sources.readers import read_table
    from zed_spark.textops import (
        bpe_token_count,
        chunk_documents,
        decontaminate,
        strip_duplicated_spans,
        train_bpe,
    )
    from zed_spark.textops.filters import repetition_report
    from zed_spark.textops.minhash import dedup_corpus
    from zed_spark.textops.sampling import hash_sample, pack_shards
    from zed_spark.textops.analysis import token_count

    docs = read_table(spark, sf, "documents")
    out = {"raw": docs, "profile": profile_table(docs)}

    # 1. repetition/quality filter: keep docs below the dup-word and
    #    top-bigram-coverage thresholds
    rep = repetition_report(docs)
    kept = docs.join(rep.where("keep").select("doc_id"), "doc_id", "left_semi")
    out["filtered"] = kept

    # 2. near-dup corpus dedup (one representative per cluster)
    deduped = dedup_corpus(kept, k_shingle=2, num_hashes=16, bands=8, threshold=0.35)
    out["deduped"] = deduped

    # 3. decontaminate against a held-out eval slice
    eval_df = docs.where(F.col("doc_id") % 17 == 3)
    clean = decontaminate(deduped, eval_df, n=5, min_hits=1)
    out["decontaminated"] = clean

    # 4. cut duplicated spans (exact substring dedup, Lee et al.)
    stripped = strip_duplicated_spans(clean, n=4, min_count=2)
    out["stripped"] = stripped

    # 5. fixed-length chunks with overlap
    chunks = chunk_documents(stripped, max_tokens=32, stride=24)
    out["chunks"] = chunks

    # 6. deterministic 50% sample (stable under appends)
    sampled = hash_sample(stripped, 0.5)
    out["sampled"] = sampled

    # 7. pack into ~2000-token shards per language
    packed = pack_shards(
        sampled.select(
            "doc_id", "lang",
            token_count(F.col("text")).cast("long").alias("n_tokens"),
        ),
        2000,
        by="lang",
    )
    out["packed"] = packed

    # 8. tokenizer induction on the final corpus + real token counts
    merges = train_bpe(sampled, n_merges=50)
    out["bpe_tokens"] = bpe_token_count(sampled, merges)

    if show:
        out["profile"].show(truncate=22)
        for stage in ("raw", "filtered", "deduped", "decontaminated", "stripped"):
            print(f"{stage:>15}: {out[stage].count()} docs")
        print(f"{'chunks':>15}: {out['chunks'].count()} windows")
        print(f"{'sampled':>15}: {out['sampled'].count()} docs")
        packed.groupBy("lang").agg(
            F.countDistinct("shard").alias("shards"),
            F.sum("n_tokens").alias("tokens"),
        ).orderBy("lang").show()
        bt = out["bpe_tokens"].agg(F.sum("n_tokens")).first()[0]
        print(f"{'bpe tokens':>15}: {bt} (50 merges)")
    return out


if __name__ == "__main__":
    from zed_spark.session import build_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    run_pipeline(build_spark(), sf)
