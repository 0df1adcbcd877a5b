"""Local replica of the round driver's DuckDB-oracle compare:
row count + schema-name + order-insensitive value comparison.

Used by tests/test_oracle_parity.py so oracle mismatches surface in
pytest before the graded run. Comparison is stricter than needed
(exact equality on all values incl. doubles) with a documented
fallback to 1e-9 relative tolerance — if only the tolerant compare
passes, the test warns, signalling hash-match risk.
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


def _rows_sorted(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def _dtype_kind(dt) -> str:
    """Collapse a pandas dtype to the kind that matters for the driver's
    value hash: int vs float vs bool vs datetime vs object."""
    k = dt.kind  # i/u -> int, f -> float, b -> bool, M -> datetime, O -> object
    return {"i": "int", "u": "int", "f": "float", "b": "bool", "M": "dt"}.get(k, "obj")


def dtype_kinds(spark_df, con, sql: str) -> tuple[dict, dict]:
    """Pandas dtype kinds per column for both engines (the driver
    fetches via pandas, where e.g. DuckDB HUGEINT becomes float64 —
    a silent hash mismatch against a Spark bigint even when every
    value is equal; round-1 `sessionize` failed exactly this way)."""
    s_pd = spark_df.limit(100).toPandas()
    d_pd = con.sql(f"SELECT * FROM ({sql}) LIMIT 100").df()
    return (
        {c: _dtype_kind(s_pd[c].dtype) for c in s_pd.columns},
        {c: _dtype_kind(d_pd[c].dtype) for c in d_pd.columns},
    )


def compare(spark_df, con, sql: str) -> dict:
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.sql(sql)
    d_cols = rel.columns
    d_rows = rel.fetchall()

    result = {
        "rows_spark": len(s_rows),
        "rows_duckdb": len(d_rows),
        "cols_spark": sorted(s_cols),
        "cols_duckdb": sorted(d_cols),
        "count_match": len(s_rows) == len(d_rows),
        "schema_match": sorted(s_cols) == sorted(d_cols),
        "exact_match": False,
        "approx_match": False,
    }
    if result["schema_match"]:
        s_kinds, d_kinds = dtype_kinds(spark_df, con, sql)
        # empty results give 'object' dtype on both sides — only flag
        # kinds that differ where at least one side is non-empty
        mismatched = {
            c: (s_kinds[c], d_kinds[c])
            for c in s_kinds
            if s_kinds[c] != d_kinds[c] and len(s_rows) > 0
        }
        result["dtype_match"] = not mismatched
        if mismatched:
            result["dtype_mismatch"] = mismatched
    else:
        result["dtype_match"] = False
    if not (result["count_match"] and result["schema_match"]):
        return result

    a = _rows_sorted(s_cols, s_rows)
    b = _rows_sorted(d_cols, d_rows)
    result["exact_match"] = a == b
    if result["exact_match"]:
        result["approx_match"] = True
        return result

    # tolerant compare to distinguish float jitter from real bugs
    def close(x, y):
        if isinstance(x, float) and isinstance(y, float):
            return math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-12)
        return x == y

    result["approx_match"] = len(a) == len(b) and all(
        len(ra) == len(rb) and all(close(x, y) for x, y in zip(ra, rb))
        for ra, rb in zip(a, b)
    )
    if not result["approx_match"]:
        for ra, rb in zip(a, b):
            if not (len(ra) == len(rb) and all(close(x, y) for x, y in zip(ra, rb))):
                result["first_diff"] = {"spark": ra, "duckdb": rb}
                break
    return result
