"""Every oracle-backed entry in __spark_entry__.REGISTRY must match
DuckDB exactly (the driver's t2 gate, at sf0.001 for speed; the
driver runs sf0.01)."""

import warnings

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_DIR
from tests.oracle_utils import compare, duckdb_con

ORACLE_CASES = sorted(entry_mod.oracle_sql().keys())
ROWS_ONLY = sorted(set(entry_mod.queries()) - set(entry_mod.oracle_sql()))

# queries rotated OUT of the 50-entry graded registry (round-6: slots
# freed for zson_read/fuse_hetero) keep full oracle parity here
from zed_spark import queries_core as qc  # noqa: E402
from zed_spark import queries_text as qt  # noqa: E402

EXTRA_ORACLES = {
    "json_props": (qc.json_props, qc.JSON_SQL),
    "zq_summary": (qc.zq_summary, qc.ZQ_SUMMARY_SQL),
    "drop_rename": (qc.drop_rename, qc.DROP_RENAME_SQL),
    # round-9 training-data additions (pinned 50-entry registry is
    # frozen; extras carry their own oracle here)
    "repetition_filter": (qt.repetition_filter_q, qt.REPETITION_SQL),
    "pii_scan": (qt.pii_scan_q, qt.PII_SQL),
    # round-10 training-data additions
    "corpus_sample": (qt.corpus_sample_q, qt.CORPUS_SAMPLE_SQL),
    "shard_pack": (qt.shard_pack_q, qt.SHARD_PACK_SQL),
    "dedup_corpus": (qt.dedup_corpus_q, qt.DEDUP_CORPUS_SQL),
    "mixture_sample": (qt.mixture_sample_q, qt.MIXTURE_SAMPLE_SQL),
    # round-11: incremental (cross-snapshot) dedup — output-equal to
    # full-corpus dedup, so it shares that oracle; the Spark side
    # persists+rereads minhash signatures through a lake pool and
    # never rescans old text
    "incremental_dedup": (qt.incremental_dedup_q, qt.DEDUP_CORPUS_SQL),
    # round-11 late tranche: exact substring dedup (duplicated-span
    # detection, Lee et al. 2021 semantics) + benchmark
    # decontamination (n-gram collision vs a broadcast eval set)
    "duplicated_spans": (qt.duplicated_spans_q, qt.DUP_SPANS_SQL),
    "strip_spans": (qt.strip_spans_q, qt.STRIP_SPANS_SQL),
    "decontaminate": (qt.decontaminate_q, qt.DECONTAM_SQL),
    "chunk_documents": (qt.chunk_documents_q, qt.CHUNK_SQL),
    "quantize_embeddings": (qt.quantize_embeddings_q, qt.QUANTIZE_SQL),
    "profile_documents": (qt.profile_documents_q, qt.PROFILE_SQL),
    "word_counts_top": (qt.word_counts_top_q, qt.WORD_COUNTS_SQL),
    "lm_quality": (qt.lm_quality_q, qt.LM_QUALITY_SQL),
}


@pytest.fixture(scope="module")
def con():
    return duckdb_con(SF_DIR)


@pytest.mark.parametrize("name", ORACLE_CASES)
def test_oracle_parity(spark, con, name):
    fn = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    res = compare(fn(spark, SF_DIR), con, sql)
    assert res["count_match"], f"{name}: row count {res['rows_spark']} vs {res['rows_duckdb']}"
    assert res["schema_match"], f"{name}: cols {res['cols_spark']} vs {res['cols_duckdb']}"
    assert res["dtype_match"], f"{name}: pandas dtype kinds differ: {res.get('dtype_mismatch')}"
    assert res["approx_match"], f"{name}: values differ: {res.get('first_diff')}"
    if not res["exact_match"]:
        warnings.warn(f"{name}: only approx match — value-hash risk")


@pytest.mark.parametrize("name", sorted(EXTRA_ORACLES))
def test_rotated_out_parity(spark, con, name):
    fn, sql = EXTRA_ORACLES[name]
    res = compare(fn(spark, SF_DIR), con, sql)
    assert res["count_match"], f"{name}: row count {res['rows_spark']} vs {res['rows_duckdb']}"
    assert res["schema_match"], f"{name}: cols {res['cols_spark']} vs {res['cols_duckdb']}"
    assert res["approx_match"], f"{name}: values differ: {res.get('first_diff')}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    fn = entry_mod.queries()[name]
    df = fn(spark, SF_DIR)
    assert df.count() >= 0


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
