"""Cross-snapshot incremental dedup: output-equal to full-corpus
dedup, with signatures persisted through the lake layer (round-11
VERDICT item 7)."""

from pyspark.sql import functions as F

from zed_spark.textops.incremental import (
    build_signatures,
    incremental_dedup,
    read_signatures,
    write_signatures,
)
from zed_spark.textops.minhash import dedup_corpus

SF = "/root/testdata/sf0.001"


def _docs(spark):
    from zed_spark.sources.readers import read_table

    return read_table(spark, SF, "documents")


def _ids(df):
    return sorted(r["doc_id"] for r in df.select("doc_id").collect())


def test_incremental_equals_full(spark, tmp_path):
    docs = _docs(spark)
    cut = docs.approxQuantile("doc_id", [0.7], 0.0)[0]
    old = docs.filter(F.col("doc_id") <= cut)
    new = docs.filter(F.col("doc_id") > cut)

    old_clean = dedup_corpus(old)
    sigs = build_signatures(old)

    # persist + reread through the lake layer
    from zed_spark.sources.lake import Lake

    lake = Lake(spark, str(tmp_path / "lake"))
    write_signatures(lake, "minhash_sigs", sigs)
    stored = read_signatures(lake, "minhash_sigs")

    assembled = incremental_dedup(new, stored, old_deduped=old_clean)
    full = dedup_corpus(docs)
    assert _ids(assembled) == _ids(full)


def test_incremental_edge_cases(spark):
    """New exact copies of old texts (smaller AND larger ids), a new
    bridge doc merging two old clusters, shingle-less texts, and
    genuinely-new near-dup groups — each against the full rerun."""
    base = [
        # old corpus: two near-dup clusters + an unclustered doc +
        # a shingle-less exact-dup pair (one-word texts shingle empty
        # at k=3)
        (10, "the quick brown fox jumps over the lazy dog today"),
        (11, "the quick brown fox jumps over the lazy dog tonight"),
        (20, "pack my box with five dozen fresh liquor jugs now"),
        (21, "pack my box with five dozen fresh liquor jugs here"),
        (30, "completely unrelated text about distributed query engines"),
        (40, "tiny"),
        (41, "tiny"),
    ]
    new = [
        # exact copy of old text, larger id -> dropped
        (50, "the quick brown fox jumps over the lazy dog today"),
        # exact copy of old unclustered text, SMALLER id -> displaces 30
        (5, "completely unrelated text about distributed query engines"),
        # another shingle-less copy -> kept (never clusters)
        (51, "tiny"),
        # genuinely-new near-dup pair -> min survives
        (60, "fresh crawl document with some repeated crawl content xx"),
        (61, "fresh crawl document with some repeated crawl content yy"),
    ]
    schema = "doc_id long, text string"
    old_df = spark.createDataFrame(base, schema)
    new_df = spark.createDataFrame(new, schema)
    both = spark.createDataFrame(base + new, schema)

    old_clean = dedup_corpus(old_df)
    sigs = build_signatures(old_df)
    kept_new, retired = incremental_dedup(new_df, sigs)

    full = dedup_corpus(both)
    got = sorted(
        set(_ids(old_clean)) - set(r["doc_id"] for r in retired.collect())
        | set(_ids(kept_new))
    )
    assert got == _ids(full)
    # the displaced old survivor is exactly doc 30
    assert [r["doc_id"] for r in retired.collect()] == [30]


def test_text_signatures_unique_path_equals_general(spark):
    """round-11: the fresh-signature leg skips the exact-dup collapse
    (assume_unique=True) because fresh_docs hold one min-id row per
    distinct text by construction. On such input the fast path must
    produce exactly the general path's signature rows."""
    from zed_spark.textops.incremental import _text_signatures

    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (5, "pack my box with five dozen fresh liquor jugs now"),
        (9, "zz"),  # shingle-less at k=3: null minhashes
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    kw = dict(text_col="text", id_col="doc_id", k_shingle=3, num_hashes=8)

    def norm(frame):
        return sorted(
            (
                r["__h"],
                r["min_id"],
                tuple(r["minhashes"]) if r["minhashes"] is not None else None,
                tuple(r["hashset"]) if r["hashset"] is not None else None,
            )
            for r in frame.collect()
        )

    general = _text_signatures(df, **kw)
    fast = _text_signatures(df, assume_unique=True, **kw)
    assert norm(fast) == norm(general)
    # and the fast path's plan really dropped the collapse aggregate:
    # exactly one HashAggregate pair (the minhash aggregation), not two
    def n_aggs(frame):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        return plan.lower().count("hashaggregate")

    assert n_aggs(fast) < n_aggs(general)
