"""MinHash + LSH near-duplicate detection.

Pipeline: word shingles → K minhashes → B bands of R rows →
band-bucket join → candidate pairs → (optional) exact-Jaccard verify.

Hash design: minhash_i(doc) = MIN over shingles of md5("<i>:" + sh)
— the lexicographic minimum of an md5 hex string is a uniform
minhash, is deterministic across runs/engines (no seed state), and
lets the DuckDB oracle reproduce the exact signature. md5 is
JVM-native in Spark (no Python in the hot path).

Scale: the band join shuffles on (band_index, band_hash) — docs per
bucket is small by construction, so the pair blow-up is bounded;
this is the standard web-scale dedup shape (e.g. the GPT-3/C4
dedup recipe).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from zed_spark.textops.dedup import word_shingles


def minhash_signature(shingles: Column, num_hashes: int = 16) -> Column:
    """Array of K minhash values (md5-hex strings)."""
    return F.array(
        *[
            F.array_min(F.transform(shingles, lambda s, i=i: F.md5(F.concat(F.lit(f"{i}:"), s))))
            for i in range(num_hashes)
        ]
    )


def band_hashes(signature: Column, bands: int, rows_per_band: int) -> Column:
    """Array of B band hashes: md5 of the concatenated band slice."""
    return F.array(
        *[
            F.md5(F.concat_ws(",", F.slice(signature, b * rows_per_band + 1, rows_per_band)))
            for b in range(bands)
        ]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float | None = 0.5,
) -> DataFrame:
    """Candidate near-dup pairs via MinHash-LSH banding, optionally
    verified with exact Jaccard (threshold!=None adds the verify
    join and a `jaccard` column — no false positives).
    """
    rows_per_band = num_hashes // bands
    docs = df.select(
        F.col(id_col).alias("id"), word_shingles(F.col(text_col), k_shingle).alias("shingles")
    )
    sig = docs.select(
        "id", "shingles", minhash_signature(F.col("shingles"), num_hashes).alias("sig")
    )
    banded = sig.select(
        "id",
        "shingles",
        F.posexplode(band_hashes(F.col("sig"), bands, rows_per_band)).alias("band", "bh"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.shingles").alias("sh_a"),
            F.col("b.shingles").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    if threshold is None:
        return pairs.select("id_a", "id_b")
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.col("sh_a")) + F.size(F.col("sh_b")) - inter
    return (
        pairs.withColumn("jaccard", inter / union)
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
