"""Driver-side size gates: the text formatters and pack_shards(by=None)
fail fast with conversion advice instead of collecting unbounded data
to the driver (round-11; mirrors the VNG/ZSON-ingest gate pattern)."""

import pytest


def test_text_formatters_gated(spark, monkeypatch):
    from zed_spark.sources.csv_io import to_csv_text
    from zed_spark.sources.jsonio import to_json_text
    from zed_spark.sources.textio import to_table_text, to_text_text
    from zed_spark.sources.zson import df_to_zson_pretty

    big = spark.range(50).toDF("x")
    monkeypatch.setenv("SPARK_GRAFT_TEXT_FORMAT_MAX_ROWS", "10")
    for fmt in (to_text_text, to_table_text, to_json_text, to_csv_text,
                df_to_zson_pretty):
        with pytest.raises(ValueError, match="renders on the driver"):
            fmt(big)

    # under the gate everything still formats
    small = spark.range(3).toDF("x")
    assert to_csv_text(small).startswith("x")
    assert len(df_to_zson_pretty(small)) == 3
    assert to_json_text(small).count("\n") >= 2
    assert to_text_text(small).strip().splitlines()
    assert to_table_text(small).startswith("x")


def test_pack_shards_serial_gate(spark, monkeypatch):
    from zed_spark.textops.sampling import pack_shards

    df = spark.range(100).selectExpr(
        "id as doc_id", "10 as n_tokens", "'en' as lang"
    )
    monkeypatch.setenv("SPARK_GRAFT_PACK_SHARDS_MAX_SERIAL_ROWS", "50")
    with pytest.raises(ValueError, match="ONE serial window task"):
        pack_shards(df, budget=100).count()

    # explicit opt-in and the per-group path both still work
    assert pack_shards(df, budget=100, allow_serial=True).count() == 100
    assert pack_shards(df, budget=100, by="lang").count() == 100
    # under the gate by=None needs no opt-in (manifest scale)
    small = df.limit(10)
    assert pack_shards(small, budget=100).count() == 10
