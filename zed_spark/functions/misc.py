"""Misc scalar functions: compare, coalesce-with-errors, base64/hex,
ksuid (reference: compare.go, coalesce.go, bytes.go, ksuid.go).

abs/ceil/floor/round/sqrt/pow/log and least/greatest (zed variadic
min/max, math.go) are the pyspark builtins — use them directly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def compare(a: Column, b: Column, nulls_max: bool = True) -> Column:
    """Total-order comparator → -1/0/1 (compare.go). Nulls sort max
    (default) or min."""
    null_rank = F.lit(1) if nulls_max else F.lit(-1)
    return (
        F.when(a.isNull() & b.isNull(), 0)
        .when(a.isNull(), null_rank)
        .when(b.isNull(), -null_rank)
        .when(a < b, -1)
        .when(a > b, 1)
        .otherwise(0)
    )


def coalesce(*cols: Column) -> Column:
    """First non-null (zed: first non-null, non-error — with the
    error-map convention, error'd values are already null here)."""
    return F.coalesce(*cols)


def to_base64(e: Column) -> Column:
    return F.base64(e.cast("binary"))


def from_base64(e: Column) -> Column:
    return F.unbase64(e)


def to_hex(e: Column) -> Column:
    # reference hex() emits lowercase digits (function/hex.go)
    return F.lower(F.hex(e))


def from_hex(e: Column) -> Column:
    return F.unhex(e)


# --- KSUID codec (real; public format) -------------------------------------
# A KSUID is 20 bytes (4-byte big-endian timestamp since 2014-05-13 +
# 16 payload bytes) rendered as a fixed-width 27-char base62 string.
# Reference behavior (runtime/sam/expr/function/ksuid.go): bytes →
# base62 string, string → bytes.

_B62 = "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
_B62_INDEX = {c: i for i, c in enumerate(_B62)}
KSUID_EPOCH = 1_400_000_000  # 2014-05-13, the ksuid epoch offset


def ksuid_encode_bytes(b: bytes) -> str:
    if len(b) != 20:
        raise ValueError(f"ksuid: need 20 bytes, got {len(b)}")
    n = int.from_bytes(b, "big")
    out = []
    for _ in range(27):
        n, r = divmod(n, 62)
        out.append(_B62[r])
    return "".join(reversed(out))


def ksuid_decode_str(s: str) -> bytes:
    if len(s) != 27:
        raise ValueError(f"ksuid: need 27 chars, got {len(s)}")
    n = 0
    for c in s:
        n = n * 62 + _B62_INDEX[c]
    return n.to_bytes(20, "big")


def ksuid_to_string(e: Column) -> Column:
    """bytes(20) → base62 ksuid string."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def enc(s):
        import pandas as pd

        def safe(b):
            try:
                if b is None:
                    return None
                if isinstance(b, str):
                    # the service marshals ksuids as 0x<40hex> in
                    # JSON (api types); ksuid() accepts that form
                    # (service/ztests/curl-stats.yaml idiom)
                    if b.startswith("0x"):
                        return ksuid_encode_bytes(bytes.fromhex(b[2:]))
                    return b if len(b) == 27 else None
                return ksuid_encode_bytes(bytes(b))
            except Exception:
                return None

        return pd.Series([safe(b) for b in s])

    return enc(e)


def ksuid_parse(e: Column) -> Column:
    """base62 ksuid string → bytes(20)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("binary")
    def dec(s):
        import pandas as pd

        def safe(v):
            try:
                return None if v is None else ksuid_decode_str(v)
            except Exception:
                return None

        return pd.Series([safe(v) for v in s])

    return dec(e)


def ksuid(e: Column, mode: str = "encode") -> Column:
    """ksuid(bytes) → string / ksuid(string, mode='decode') → bytes
    (ksuid.go dispatches on the argument type; Columns are untyped at
    this layer, so the direction is a parameter — the language
    front end probes the schema and picks it)."""
    return ksuid_to_string(e) if mode == "encode" else ksuid_parse(e)
