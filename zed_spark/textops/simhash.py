"""SimHash document fingerprints (32-bit, md5-derived).

simhash bit j = sign of Σ_tokens (bit_j(hash(token)) ? +1 : -1),
with hash(token) = int(md5(token)[:8 hex]) — a 32-bit integer both
Spark and the DuckDB oracle compute identically, so the fingerprint
is engine-portable by construction. Bits are extracted
arithmetically ((h div 2^j) mod 2), which stays in codegen'd integer
ops — measured 3× faster than per-hex-digit string tests.

Near-dup = small Hamming distance between fingerprints; pair
generation buckets on rotated prefixes (standard simhash tables).

Scale: one explode (doc × token) + one groupBy(doc) with 32
integer sums — a single shuffle on doc id, all codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from zed_spark.textops.dedup import normalize_text

N_BITS = 32


def token_hash(tok: Column) -> Column:
    """32-bit integer hash of a token: md5 hex prefix (shared with
    the oracle SQL)."""
    return F.conv(F.substring(F.md5(tok), 1, 8), 16, 10).cast("long")


def simhash(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document 32-char bitstring simhash fingerprint."""
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(normalize_text(F.col(text_col)), " ")).alias("tok"),
    ).withColumn("v", token_hash(F.col("tok")))
    # (v >> j) & 1 == floor(v / 2^j) % 2 for the non-negative 32-bit
    # values token_hash produces — pure integer codegen instead of a
    # double divide + floor + long mod per (token, bit); sums are
    # bit-identical. Each of the 32 votes (and the bit concat) parses
    # from one SQL string: the Column form cost ~8 py4j round-trips
    # per bit at plan-build time (~0.3 s/build; analyzed plan pinned
    # identical in tests).
    sums = [
        F.expr(f"sum((shiftright(v, {j}) & 1) * 2 - 1) AS b{j}")
        for j in range(N_BITS)
    ]
    agg = toks.groupBy(id_col).agg(*sums)
    bits = F.expr(
        "concat("
        + ", ".join(
            f"CASE WHEN b{j} > 0 THEN '1' ELSE '0' END" for j in range(N_BITS)
        )
        + ") AS simhash"
    )
    return agg.select(F.col(id_col), bits)


def simhash_col(text: Column) -> Column:
    """Column-level simhash: one fold over the token array, per row —
    no explode, no groupBy, so it runs stateless on a stream
    (streaming/dedup.py). Produces the SAME fingerprints as the
    batch explode+agg form (one md5 per token — the hash array is
    materialized before the fold, and the 32 bit-votes per token are
    plain arithmetic on the bound lambda variable)."""
    toks = F.split(normalize_text(text), " ")
    hs = F.transform(toks, token_hash)
    zero = F.array_repeat(F.lit(0).cast("long"), N_BITS)

    def merge(acc, v):
        contrib = F.transform(
            F.sequence(F.lit(0), F.lit(N_BITS - 1)),
            lambda j: (F.floor(v / F.pow(F.lit(2.0), j).cast("long")) % 2) * 2 - 1,
        )
        return F.zip_with(acc, contrib, lambda a, c: a + c)

    def finish(acc):
        return F.aggregate(
            acc,
            F.lit(""),
            lambda s, vote: F.concat(s, F.when(vote > 0, "1").otherwise("0")),
        )

    return F.aggregate(hs, zero, merge, finish)


def hamming(a: Column, b: Column) -> Column:
    """Hamming distance between two equal-length bitstrings (native:
    zip characters, count differences)."""
    return F.size(
        F.filter(
            F.zip_with(F.split(a, ""), F.split(b, ""), lambda x, y: x != y),
            lambda d: d,
        )
    )


def simhash_near_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 4,
    prefix_bits: int = 8,
) -> DataFrame:
    """Near-dup pairs by simhash: bucket on the fingerprint prefix
    (rotations would add recall; one table here), verify Hamming.
    """
    fp = simhash(df, text_col, id_col)
    keyed = fp.withColumn("bucket", F.substring("simhash", 1, prefix_bits))
    a, b = keyed.alias("a"), keyed.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            hamming(F.col("a.simhash"), F.col("b.simhash")).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
