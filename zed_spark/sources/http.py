"""HTTPScan — read a URL into a DataFrame (reference:
dag/op.go:215-223 HTTPScan; built at compiler/kernel/op.go:271).

The reference fetches on one node; same here: the driver fetches,
then parallelizes. For large remote payloads prefer landing the file
on shared storage and using spark.read directly — this operator is
for API-ish payloads (the reference uses it the same way).
Gated behind stdlib urllib; no extra deps.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession


def http_scan(
    spark: SparkSession,
    url: str,
    fmt: str = "json",
    method: str = "GET",
    headers: dict[str, str] | None = None,
    body: bytes | None = None,
    timeout: float = 30.0,
) -> DataFrame:
    """Fetch url driver-side → DataFrame. fmt: json (object-per-line
    or array) | csv | line."""
    from urllib.request import Request, urlopen

    req = Request(url, data=body, method=method, headers=headers or {})
    with urlopen(req, timeout=timeout) as resp:  # noqa: S310 (caller-supplied URL)
        text = resp.read().decode("utf-8", errors="replace")
    return _parse_payload(spark, text, fmt)


def _parse_payload(spark: SparkSession, text: str, fmt: str) -> DataFrame:
    if fmt == "json":
        stripped = text.lstrip()
        if stripped.startswith("["):
            rows = json.loads(stripped)
        else:
            rows = [json.loads(line) for line in text.splitlines() if line.strip()]
        return spark.createDataFrame(rows)
    if fmt == "csv":
        import csv
        import io

        rows = list(csv.DictReader(io.StringIO(text)))
        return spark.createDataFrame(rows)
    if fmt == "line":
        return spark.createDataFrame([(l,) for l in text.splitlines()], "value string")
    raise ValueError(f"http_scan format {fmt!r}")
