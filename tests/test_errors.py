"""First-class error-value convention (SURVEY §7.4)."""

import pytest
from pyspark.sql import functions as F

from zed_spark import errors as E


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame([(10.0, 2.0), (5.0, 0.0)], "num double, den double")


def test_safe_div_marks_error(df):
    out = E.safe_div(df, "q", F.col("num"), F.col("den"))
    rows = out.orderBy("num").collect()
    by_num = {r["num"]: r for r in rows}
    assert by_num[10.0]["q"] == 5.0
    assert by_num[10.0][E.ERROR_COL] is None
    assert by_num[5.0]["q"] is None
    assert by_num[5.0][E.ERROR_COL] == {"q": "divide by zero"}


def test_is_error_has_error_quiet(df):
    out = E.safe_div(df, "q", F.col("num"), F.col("den"))
    flagged = out.select(E.is_error(out, "q").alias("e"), "den").collect()
    assert {r["den"]: r["e"] for r in flagged} == {2.0: False, 0.0: True}
    assert out.filter(E.has_error(out)).count() == 1
    quieted = E.quiet(out, "q")
    assert quieted.filter(E.has_error(quieted)).count() == 0


def test_missing_static(df):
    assert df.select(E.missing(df, "nope").alias("m")).first()["m"] is True
    assert df.select(E.missing(df, "num").alias("m")).first()["m"] is False


def test_strip_errors(df):
    out = E.safe_div(df, "q", F.col("num"), F.col("den"))
    assert E.ERROR_COL not in E.strip_errors(out).columns


def test_error_constructor(df):
    out = E.error(df, "x", "boom")
    assert out.first()[E.ERROR_COL] == {"x": "boom"}
