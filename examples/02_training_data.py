"""Training-data pipeline ops: dedup, similarity, text analysis.

Run: python examples/02_training_data.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from zed_spark.session import build_spark
from zed_spark.sources.readers import read_table
from zed_spark.textops import exact_dedup, minhash_lsh_pairs
from zed_spark.textops.analysis import quality_report
from zed_spark.textops.similarity import brute_force_topk, embedding_near_pairs

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = build_spark()
docs = read_table(spark, sf, "documents")
emb = read_table(spark, sf, "embeddings")

print("== exact dedup (content-hash groups) ==")
exact_dedup(docs).orderBy("doc_id").show(5)

print("== near-duplicate pairs via MinHash-LSH (verified jaccard) ==")
minhash_lsh_pairs(docs, k_shingle=2, num_hashes=16, bands=8, threshold=0.35).show(5)

print("== quality / language / token report ==")
quality_report(docs).orderBy("doc_id").show(5)

print("== nearest neighbors of doc 0's embedding ==")
qv = [float(x) for x in emb.first()["embedding"]]
brute_force_topk(emb, qv, k=5).show()

print("== embedding near-dup pairs (cosine >= 0.3) ==")
embedding_near_pairs(emb, threshold=0.3).show(5)
