"""IP/CIDR functions (reference: runtime/sam/expr/function/ip.go).

zed has native ip/net types (netip.Addr/Prefix, value.go:92-93); our
representation is StringType (SURVEY §1.2). IPv4 math is pure native
Columns (split → long → shift compare) so cidr_match can filter
100 TB without leaving the JVM; IPv6 falls back to a vectorized
pandas UDF over Python's ipaddress module.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _ipv4_to_long(ip: Column) -> Column:
    """dotted-quad string → uint32-as-long, null when not IPv4."""
    parts = F.split(ip, r"\.")
    valid = (F.size(parts) == 4) & ip.rlike(r"^\d{1,3}(\.\d{1,3}){3}$")
    val = F.aggregate(
        F.transform(parts, lambda x: x.cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc * 256 + x,
    )
    return F.when(valid, val)


def cidr_match(net: str | Column, ip: Column) -> Column:
    """True when ip falls inside the CIDR network (ip.go cidr_match).

    IPv4-native fast path; for IPv6 use cidr_match_any (pandas UDF).
    """
    net_col = F.lit(net) if isinstance(net, str) else net
    base = F.split(net_col, "/").getItem(0)
    prefix = F.split(net_col, "/").getItem(1).cast("int")
    ip_l = _ipv4_to_long(ip)
    base_l = _ipv4_to_long(base)
    # shift amount is a Column, so use exact pow-of-2 division
    # (values < 2^32 are exact in double)
    div = F.pow(F.lit(2.0), (F.lit(32) - prefix)).cast("long")
    return (
        ip_l.isNotNull()
        & base_l.isNotNull()
        & (F.floor(ip_l / div) == F.floor(base_l / div))
    )


def network_of(ip: Column, prefix_len: int | Column = 24) -> Column:
    """Derive the CIDR network of an IPv4 address (ip.go network_of)."""
    p = F.lit(prefix_len) if isinstance(prefix_len, int) else prefix_len
    ip_l = _ipv4_to_long(ip)
    div = F.pow(F.lit(2.0), (F.lit(32) - p)).cast("long")
    masked = F.floor(ip_l / div) * div
    octets = [
        F.shiftright(masked, 24).bitwiseAND(F.lit(255)),
        F.shiftright(masked, 16).bitwiseAND(F.lit(255)),
        F.shiftright(masked, 8).bitwiseAND(F.lit(255)),
        masked.bitwiseAND(F.lit(255)),
    ]
    return F.concat_ws("/", F.concat_ws(".", *[o.cast("string") for o in octets]), p.cast("string"))


@F.pandas_udf(T.BooleanType())
def _cidr_match_v6(net: pd.Series, ip: pd.Series) -> pd.Series:
    import ipaddress

    def check(n, i):
        try:
            return ipaddress.ip_address(i) in ipaddress.ip_network(n, strict=False)
        except (ValueError, TypeError):
            return None

    return pd.Series([check(n, i) for n, i in zip(net, ip)], dtype=object)


def cidr_match_any(net: str | Column, ip: Column) -> Column:
    """IPv4+IPv6 CIDR match (vectorized pandas UDF — the slow path)."""
    net_col = F.lit(net) if isinstance(net, str) else net
    return _cidr_match_v6(net_col, ip)
