"""Parsing functions (reference: runtime/sam/expr/function/parse.go,
grok.go + pkg/grok/).

parse_uri: URI string → structured record (scheme/host/port/path/
query/fragment) via native parse_url calls.

grok: a compile-time translation of grok %{PATTERN:name} syntax into
a regex whose captures become struct fields via regexp_extract —
fully native, no UDF (the pattern set is the common core of the
reference's grok-patterns bundle).
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

# common grok primitives (public logstash pattern definitions)
GROK_PATTERNS: dict[str, str] = {
    "WORD": r"\b\w+\b",
    "NOTSPACE": r"\S+",
    "DATA": r".*?",
    "GREEDYDATA": r".*",
    "INT": r"[+-]?\d+",
    "NUMBER": r"[+-]?\d+(?:\.\d+)?",
    "BASE10NUM": r"[+-]?(?:\d+(?:\.\d+)?)",
    "IP": r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}",
    "IPV4": r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}",
    "HOSTNAME": r"\b[0-9A-Za-z][0-9A-Za-z-]{0,62}(?:\.[0-9A-Za-z][0-9A-Za-z-]{0,62})*\.?\b",
    "USER": r"[a-zA-Z0-9._-]+",
    "USERNAME": r"[a-zA-Z0-9._-]+",
    "TIMESTAMP_ISO8601": r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:\.\d+)?(?:Z|[+-]\d{2}:?\d{2})?",
    "LOGLEVEL": r"(?:DEBUG|INFO|WARN(?:ING)?|ERROR|FATAL|TRACE|CRITICAL)",
    "QS": r"\"[^\"]*\"",
    "UUID": r"[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}",
}

_GROK_REF = re.compile(r"%\{(\w+)(?::(\w+(?::\w+)?))?\}")


def parse_grok_definitions(defs: str) -> dict[str, str]:
    """`NAME regex` lines (one per line) → extra pattern table, the
    reference's 3-arg grok(definitions) form (function/grok.go)."""
    out: dict[str, str] = {}
    for line in defs.splitlines():
        line = line.strip()
        if not line:
            continue
        name, _, body = line.partition(" ")
        if not body:
            raise ValueError(f"grok: bad definition line {line!r}")
        out[name] = body
    return out


def grok_to_regex(
    pattern: str, defs: dict[str, str] | None = None
) -> tuple[str, list[str]]:
    """Expand %{NAME:field[:type]} refs into a plain regex + capture
    order. Custom definitions may reference other patterns (incl.
    other custom ones) — expansion iterates to a fixed point. The
    `:type` coercion suffix parses but is ignored, like the
    reference (expr/function/ztests/grok.yaml: 'Ignores type
    annotation')."""
    table = dict(GROK_PATTERNS)
    if defs:
        table.update(defs)
    fields: list[str] = []

    def sub(m: re.Match) -> str:
        name, field = m.group(1), m.group(2)
        if field and ":" in field:
            field = field.split(":", 1)[0]  # strip :type coercion
        if name not in table:
            raise ValueError(f"unknown grok pattern %{{{name}}}")
        body = table[name]
        if field:
            fields.append(field)
            return f"({body})"
        return f"(?:{body})"

    out = pattern
    for _ in range(16):  # nested custom refs expand iteratively
        new = _GROK_REF.sub(sub, out)
        if new == out:
            break
        out = new
    else:
        raise ValueError("grok: pattern recursion too deep")
    return out, fields


def grok(
    pattern: str,
    s: Column,
    definitions: str | None = None,
    error_value: bool = False,
) -> Column:
    """Parse s with a grok pattern → struct of captured fields
    (all strings, like the reference which emits strings unless
    cast). Duplicate capture names squash to the LAST occurrence
    (grok.yaml). Unmatched rows → null struct, or — with
    error_value=True, the zed-language surface — a value|error
    carrier whose error is the reference's
    'grok(): value does not match pattern'."""
    defs = parse_grok_definitions(definitions) if definitions else None
    regex, fields = grok_to_regex(pattern, defs)
    if not fields:
        raise ValueError("grok pattern has no named captures")
    # duplicate names: keep the LAST capture group per name, field
    # order = first appearance
    last_idx: dict[str, int] = {}
    order: list[str] = []
    for i, name in enumerate(fields):
        if name not in last_idx:
            order.append(name)
        last_idx[name] = i
    parts = [
        F.regexp_extract(s, regex, last_idx[name] + 1).alias(name)
        for name in order
    ]
    matched = s.rlike(regex)
    if not error_value:
        return F.when(matched, F.struct(*parts))
    from pyspark.sql import types as T

    err_t = T.StructType(
        [
            T.StructField("message", T.StringType()),
            T.StructField("on", T.StringType()),
        ]
    )
    return F.struct(
        F.when(matched, F.lit(0)).otherwise(F.lit(1)).alias("tag"),
        F.when(matched, F.struct(*parts)).alias("v0"),
        F.when(
            ~matched,
            F.struct(
                F.lit("grok(): value does not match pattern").alias(
                    "message"
                ),
                s.alias("on"),
            ),
        )
        .cast(err_t)
        .alias("e1"),
    )


URI_DDL = (
    "scheme:string,opaque:string,user:string,password:string,"
    "host:string,port:int,path:string,"
    "query:map<string,array<string>>,fragment:string"
)


def parse_uri_full(s: Column) -> Column:
    """Reference-fidelity parse_uri (function/parse.go wraps Go's
    url.Parse): returns a value|error carrier struct<tag, v0:<uri
    record>, e1:{message,on:string}> — opaque URIs, userinfo,
    uint16-validated ports, query as map<string,[string]>, and the
    reference's error messages (missing scheme, invalid port,
    non-empty-string requirement). Arrow-batched UDF: URI parsing is
    per-value string surgery with no vectorizable form."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(f"tag int, v0 struct<{URI_DDL}>, e1 struct<message:string,on:string>")
    def f(col):
        import re as _r
        from urllib.parse import parse_qs

        tags, vals, errs = [], [], []

        def err(msg, on):
            tags.append(1)
            vals.append(None)
            errs.append({"message": msg, "on": on})

        def ok(d):
            tags.append(0)
            vals.append(d)
            errs.append(None)

        empty = {
            "scheme": None, "opaque": None, "user": None,
            "password": None, "host": None, "port": None,
            "path": None, "query": None, "fragment": None,
        }
        for v in col:
            if v is None:
                err("parse_uri: non-empty string arg required", None)
                continue
            if v == "":
                ok(dict(empty))
                continue
            if v.startswith(":"):
                err(
                    f'parse_uri: parse "{v}": missing protocol scheme', v
                )
                continue
            d = dict(empty)
            rest = v
            m = _r.match(r"^([A-Za-z][A-Za-z0-9+.\-]*):(.*)$", v, _r.S)
            if m:
                d["scheme"], rest = m.group(1), m.group(2)
            frag = None
            if "#" in rest:
                rest, frag = rest.split("#", 1)
            d["fragment"] = frag
            if m and not rest.startswith("//"):
                d["opaque"] = rest or None
                ok(d)
                continue
            if rest.startswith("//"):
                rest = rest[2:]
                auth, sep, tail = rest.partition("/")
                rest = sep + tail if sep else ""
                qpos = auth.find("?")
                if qpos >= 0:
                    rest = auth[qpos:] + rest
                    auth = auth[:qpos]
                if "@" in auth:
                    userinfo, auth = auth.rsplit("@", 1)
                    u, _s2, pw = userinfo.partition(":")
                    d["user"] = u or None
                    d["password"] = pw or None
                if ":" in auth:
                    h, _s3, p = auth.rpartition(":")
                    if p and not p.isdigit():
                        err(
                            f'parse_uri: parse "{v}": invalid port '
                            f'":{p}" after host',
                            v,
                        )
                        continue
                    if p and not 0 <= int(p) <= 65535:
                        err(f"parse_uri: invalid port: {p}", v)
                        continue
                    d["host"] = h or None
                    d["port"] = int(p) if p else None
                else:
                    d["host"] = auth or None
            q = None
            if "?" in rest:
                rest, q = rest.split("?", 1)
            d["path"] = rest or None
            if q is not None:
                d["query"] = {
                    k: vs
                    for k, vs in parse_qs(
                        q, keep_blank_values=True
                    ).items()
                }
            ok(d)
        return pd.DataFrame({"tag": tags, "v0": vals, "e1": errs})

    return f(s)


def parse_uri(s: Column) -> Column:
    """URI → record {scheme, host, port, path, query, fragment}
    (parse.go parse_uri). Query stays a raw string; use
    str_to_map(query, '&', '=') for the map form."""
    return F.struct(
        F.lower(F.regexp_extract(s, r"^([A-Za-z][A-Za-z0-9+.-]*):", 1)).alias("scheme"),
        F.parse_url(s, F.lit("HOST")).alias("host"),
        F.nullif(
            F.regexp_extract(F.parse_url(s, F.lit("AUTHORITY")), r":(\d+)$", 1), F.lit("")
        ).cast("int").alias("port"),
        F.parse_url(s, F.lit("PATH")).alias("path"),
        F.parse_url(s, F.lit("QUERY")).alias("query"),
        F.parse_url(s, F.lit("REF")).alias("fragment"),
    )
