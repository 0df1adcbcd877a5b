"""Sources & sinks: file readers (parquet/json/csv/zeek-tsv/line)
and the lake layer (pools as partitioned sorted parquet + manifest).

Reference: format dispatch zio/anyio/lookup.go:24-56; lake under
lake/ (pools, branches, commits). See readers.py and lake.py.
"""

from zed_spark.sources.readers import read_any, read_table, read_zeek_tsv

__all__ = ["read_any", "read_table", "read_zeek_tsv"]
