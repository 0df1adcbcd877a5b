"""VNG — the reference's columnar file format (read + write).

Layout per the public spec (docs/formats/vng.md): a data section of
raw segments, a reassembly section that is itself a ZNG stream
describing how segments map back to column streams, and a trailing
ZNG record ({magic,type,version,sections,meta}) found by scanning
backward from the end of the file.

Faithful to the spec's structure with two documented divergences,
both legal under "it is left to an implementation" and self-
consistent for round-trips (no byte-goldens exist for VNG in the
reference's test corpus — its own ztests are round-trips too):

  - the super types are stored as ZSON type-value STRINGS rather
    than null values of the type (the spec itself floats this:
    "Change the first N values to type values instead of nulls?"),
    because a type string round-trips precise zed types (int64 vs
    time vs duration) that a Spark-side null row would widen;
  - <map_column> carries a `lengths` segmap alongside key/value
    (the spec's {key,value} form alone cannot split entries back
    into per-row maps).

Segments are stored uncompressed (compression_format 0); the spec
allows per-segment compression choices.

Reference: vng/ (writer.go, object.go, metadata.go — structure
only, no code ported); docs/formats/vng.md is the contract.
"""

from __future__ import annotations

from pyspark.sql import types as T

from zed_spark.sources.zng import (
    _append_tagged,
    _encode_body,
    _decode_prim,
    _iter_tagged,
    encode_zng,
    parse_zng,
)

_SEGMAP_T = T.ArrayType(
    T.StructType(
        [
            T.StructField("offset", T.LongType()),
            T.StructField("length", T.LongType()),
            T.StructField("mem_length", T.LongType()),
            T.StructField("compression_format", T.LongType()),
        ]
    )
)


# --- Spark schema ↔ zed type string ---------------------------------------

_PRIM_OF_SPARK = [
    (T.LongType, "int64"),
    (T.IntegerType, "int32"),
    (T.ShortType, "int16"),
    (T.ByteType, "int8"),
    (T.DoubleType, "float64"),
    (T.FloatType, "float32"),
    (T.BooleanType, "bool"),
    (T.StringType, "string"),
    (T.BinaryType, "bytes"),
    (T.TimestampType, "time"),
    (T.TimestampNTZType, "time"),
    (T.DateType, "time"),
]


def _type_string(dt) -> str:
    for cls, name in _PRIM_OF_SPARK:
        if isinstance(dt, cls):
            return name
    if isinstance(dt, T.DecimalType):
        return "float64"
    if isinstance(dt, T.ArrayType):
        return "[%s]" % _type_string(dt.elementType)
    if isinstance(dt, T.MapType):
        return "|{%s:%s}|" % (
            _type_string(dt.keyType),
            _type_string(dt.valueType),
        )
    if isinstance(dt, T.StructType):
        return "{%s}" % ",".join(
            "%s:%s" % (f.name, _type_string(f.dataType)) for f in dt.fields
        )
    raise ValueError(f"vng writer: unsupported Spark type {dt}")


# --- encoding ---------------------------------------------------------------


class _Data:
    """The growing data section; placing a segment returns its segmap
    entry."""

    def __init__(self):
        self.buf = bytearray()

    def place(self, blob: bytes) -> list:
        if not blob:
            return []
        off = len(self.buf)
        self.buf += blob
        return [
            {
                "offset": off,
                "length": len(blob),
                "mem_length": len(blob),
                "compression_format": 0,
            }
        ]


def _int_stream(ints) -> bytes:
    """A column stream of ZNG int32 values (presence runs, lengths,
    tags, the super column)."""
    out = bytearray()
    for i in ints:
        # a None entry marks a null container value (documented
        # divergence: the reference wraps whole columns in a Nulls
        # encoder; this format rides a null length tag instead)
        _append_tagged(
            out, None if i is None else _encode_body(int(i), T.LongType())
        )
    return bytes(out)


def _presence_runs(flags) -> list:
    """Alternating present/absent run lengths, starting with a
    present count (vng.md "Presence Columns")."""
    runs = []
    cur_present = True
    count = 0
    for f in flags:
        if f == cur_present:
            count += 1
        else:
            runs.append(count)
            cur_present = f
            count = 1
    runs.append(count)
    return runs


def _encode_column(dt, values, data: _Data):
    """Encode `values` (nulls included) of Spark type dt into the
    data section; returns the reassembly node (column, schema) pair
    where schema is the Spark type OF the reassembly node."""
    if isinstance(dt, T.StructType):
        fields = {}
        fschema = []
        for f in dt.fields:
            fvals = []
            flags = []
            for v in values:
                if v is None:
                    fv = None
                else:
                    d = v.asDict() if hasattr(v, "asDict") else v
                    fv = d.get(f.name)
                flags.append(fv is not None)
                if fv is not None:
                    fvals.append(fv)
            if not fvals:
                col, cschema = None, T.NullType()
                presence = []
            else:
                col, cschema = _encode_column(f.dataType, fvals, data)
                presence = (
                    data.place(_int_stream(_presence_runs(flags)))
                    if not all(flags)
                    else []
                )
            fields[f.name] = {"column": col, "presence": presence}
            fschema.append(
                T.StructField(
                    f.name,
                    T.StructType(
                        [
                            T.StructField("column", cschema),
                            T.StructField("presence", _SEGMAP_T),
                        ]
                    ),
                )
            )
        return fields, T.StructType(fschema)
    if isinstance(dt, (T.ArrayType,)):
        lengths = []
        flat = []
        for v in values:
            if v is None:
                lengths.append(None)
            else:
                lengths.append(len(v))
                flat.extend(list(v))
        col, cschema = (
            _encode_column(dt.elementType, flat, data)
            if flat
            else (None, T.NullType())
        )
        node = {
            "values": col,
            "lengths": data.place(_int_stream(lengths)),
        }
        schema = T.StructType(
            [
                T.StructField("values", cschema),
                T.StructField("lengths", _SEGMAP_T),
            ]
        )
        return node, schema
    if isinstance(dt, T.MapType):
        lengths = []
        keys = []
        vals = []
        for v in values:
            if v is None:
                lengths.append(None)
                continue
            items = sorted(v.items(), key=lambda kv: str(kv[0]))
            lengths.append(len(items))
            keys.extend(k for k, _ in items)
            vals.extend(x for _, x in items)
        kcol, kschema = (
            _encode_column(dt.keyType, keys, data)
            if keys
            else (None, T.NullType())
        )
        vcol, vschema = (
            _encode_column(dt.valueType, vals, data)
            if vals
            else (None, T.NullType())
        )
        node = {
            "key": kcol,
            "value": vcol,
            "lengths": data.place(_int_stream(lengths)),
        }
        schema = T.StructType(
            [
                T.StructField("key", kschema),
                T.StructField("value", vschema),
                T.StructField("lengths", _SEGMAP_T),
            ]
        )
        return node, schema
    # primitive column: counted-length value sequence, nulls inline
    # as tag 0 (only reachable for array/map elements — record-level
    # nulls ride the presence runs)
    out = bytearray()
    for v in values:
        _append_tagged(out, _encode_body(v, dt))
    return data.place(bytes(out)), _SEGMAP_T


def encode_vng(rows, schema) -> bytes:
    """Encode rows with one Spark schema (one super type) as a VNG
    file: data section + reassembly ZNG stream + trailer."""
    keep = [f for f in schema.fields if not f.name.startswith("__zed_")]
    schema = T.StructType(keep)
    rows = [
        {
            f.name: (r.asDict() if hasattr(r, "asDict") else dict(r)).get(
                f.name
            )
            for f in keep
        }
        for r in rows
    ]
    data = _Data()
    col, cschema = _encode_column(schema, rows, data)
    root_seg = data.place(_int_stream([0] * len(rows)))
    # reassembly: super type string, root segmap, the one column record
    reassembly = bytearray()
    reassembly += encode_zng(
        [{"t": _type_string(schema)}],
        T.StructType([T.StructField("t", T.StringType())]),
        compress=False,
    )
    reassembly += encode_zng(
        [{"root": root_seg}],
        T.StructType([T.StructField("root", _SEGMAP_T)]),
        compress=False,
    )
    reassembly += encode_zng(
        [{"column": col}],
        T.StructType([T.StructField("column", cschema)]),
        compress=False,
    )
    trailer = encode_zng(
        [
            {
                "magic": "vng",
                "type": "vng",
                "version": 1,
                "sections": [len(data.buf), len(reassembly)],
                "meta": {"skew_thresh": 0, "segment_thresh": 0},
            }
        ],
        T.StructType(
            [
                T.StructField("magic", T.StringType()),
                T.StructField("type", T.StringType()),
                T.StructField("version", T.LongType()),
                T.StructField("sections", T.ArrayType(T.LongType())),
                T.StructField(
                    "meta",
                    T.StructType(
                        [
                            T.StructField("skew_thresh", T.LongType()),
                            T.StructField("segment_thresh", T.LongType()),
                        ]
                    ),
                ),
            ]
        ),
        compress=False,
    )
    return bytes(data.buf) + bytes(reassembly) + trailer


def write_vng(df, path: str) -> None:
    """Single-file VNG writer.  Collects on the driver (the format
    is one sectioned file with a trailing reassembly map — it cannot
    be written as independent partitions), so the write is bounded:
    the row gate mirrors similarity.py's driver-side cap."""
    rows = df.limit(_VNG_MAX_ROWS + 1).collect()
    if len(rows) > _VNG_MAX_ROWS:
        raise ValueError(
            f"vng: result exceeds {_VNG_MAX_ROWS} rows — the VNG "
            f"writer materializes on the driver; write parquet or "
            f"zng for data at scale (or raise SPARK_GRAFT_VNG_MAX_ROWS)"
        )
    from zed_spark.sources import fsio

    fsio.write_bytes(path, encode_vng(rows, df.schema))


_VNG_MAX_ROWS = int(
    __import__("os").environ.get("SPARK_GRAFT_VNG_MAX_ROWS", "2000000")
)


# --- decoding ---------------------------------------------------------------


def _find_trailer(data: bytes):
    """Scan backward for the trailing single-record ZNG stream
    (vng.md "The Trailer")."""
    n = len(data)
    for i in range(n - 1, max(-1, n - 4096) - 1, -1):
        try:
            vals = parse_zng(data[i:])
        except Exception:
            continue
        if (
            len(vals) == 1
            and isinstance(vals[0], dict)
            and vals[0].get("magic") == "vng"
        ):
            return vals[0], i
    return None, -1


def is_vng(data: bytes) -> bool:
    if not isinstance(data, (bytes, bytearray)) or len(data) < 16:
        return False
    return _find_trailer(bytes(data))[0] is not None


class _Seg:
    """A segment-map-backed stream of tagged values."""

    def __init__(self, data: bytes, segmap):
        blob = b"".join(
            data[s["offset"] : s["offset"] + s["length"]]
            for s in (segmap or [])
        )
        self._it = _iter_tagged(blob)

    def next(self):
        return next(self._it)


def _prim_decoder(name: str):
    def dec(body):
        if body is None:
            return None
        return _decode_prim(name, body)

    return dec


class _ColReader:
    """Reconstruct one value per next() call from a column node."""

    def __init__(self, desc, node, data: bytes):
        self.desc = desc
        self.data = data
        kind = desc[0]
        if kind == "named":
            desc = desc[2]
            kind = desc[0]
            self.desc = desc
        if kind == "record":
            self.kind = "record"
            self.fields = []
            for fname, fdesc in desc[1]:
                fn = node.get(fname) if node else None
                col = fn.get("column") if fn else None
                pres = fn.get("presence") if fn else None
                sub = (
                    _ColReader(fdesc, col, data) if col is not None else None
                )
                self.fields.append(
                    (fname, sub, _RunReader(data, pres))
                )
        elif kind in ("array", "set"):
            self.kind = "array"
            self.lengths = _Seg(data, node["lengths"])
            self.values = (
                _ColReader(desc[1], node["values"], data)
                if node.get("values") is not None
                else None
            )
        elif kind == "map":
            self.kind = "map"
            self.lengths = _Seg(data, node["lengths"])
            self.keys = (
                _ColReader(desc[1], node["key"], data)
                if node.get("key") is not None
                else None
            )
            self.vals = (
                _ColReader(desc[2], node["value"], data)
                if node.get("value") is not None
                else None
            )
        else:
            self.kind = "prim"
            self.seg = _Seg(data, node)
            self.dec = _prim_decoder(desc[1])

    def next(self):
        if self.kind == "record":
            out = {}
            for fname, sub, runs in self.fields:
                if sub is None or not runs.present():
                    out[fname] = None
                else:
                    out[fname] = sub.next()
            return out
        if self.kind == "array":
            body = self.lengths.next()
            if body is None:
                return None  # null container (null length tag)
            n = int(_decode_prim("int64", body))
            return [self.values.next() for _ in range(n)]
        if self.kind == "map":
            body = self.lengths.next()
            if body is None:
                return None
            n = int(_decode_prim("int64", body))
            return {
                self.keys.next(): self.vals.next() for _ in range(n)
            }
        return self.dec(self.seg.next())


class _RunReader:
    """Presence runs: alternating present/absent counts; an empty
    segmap means always-present."""

    def __init__(self, data: bytes, segmap):
        self.always = not segmap
        if self.always:
            return
        blob = b"".join(
            data[s["offset"] : s["offset"] + s["length"]] for s in segmap
        )
        self.runs = [
            int(_decode_prim("int64", b)) for b in _iter_tagged(blob)
        ]
        self.idx = 0
        self.left = self.runs[0] if self.runs else 0
        self.cur = True

    def present(self) -> bool:
        if self.always:
            return True
        while self.left == 0:
            self.idx += 1
            if self.idx >= len(self.runs):
                return True
            self.left = self.runs[self.idx]
            self.cur = not self.cur
        self.left -= 1
        return self.cur


def parse_vng(data: bytes):
    """Decode a VNG file → (values, type_strings): one python value
    and its zed type string per original row."""
    from zed_spark.sources.ztypes import parse_type_string

    trailer, tpos = _find_trailer(bytes(data))
    if trailer is None:
        raise ValueError("vng: no trailer found")
    dlen, rlen = trailer["sections"][0], trailer["sections"][1]
    dsec = bytes(data[:dlen])
    rvals = parse_zng(bytes(data[dlen : dlen + rlen]))
    # [type strings...] + [root segmap] + [column records...]
    typestrs = []
    i = 0
    while i < len(rvals) and set(rvals[i].keys()) == {"t"}:
        typestrs.append(rvals[i]["t"])
        i += 1
    root = rvals[i]["root"]
    cols = [rvals[i + 1 + k]["column"] for k in range(len(typestrs))]
    descs = [parse_type_string(s) for s in typestrs]
    readers = [
        _ColReader(d, c, dsec) for d, c in zip(descs, cols)
    ]
    out = []
    types = []
    for b in _Seg(dsec, root)._it:
        sid = int(_decode_prim("int64", b))
        out.append(readers[sid].next())
        types.append(typestrs[sid])
    return out, types


def render_zson(v, desc) -> str:
    """Decoded VNG value + ztypes descriptor → ZSON text (enough to
    re-enter the typed ZSON reader: implied-type primitives carry
    decorations only when the type is not implied)."""
    while desc[0] == "named":
        desc = desc[2]
    kind = desc[0]
    if v is None:
        return "null" if kind == "prim" and desc[1] == "null" else (
            "null(%s)" % desc[1] if kind == "prim" else "null"
        )
    if kind == "record":
        return "{%s}" % ",".join(
            "%s:%s" % (n, render_zson(v.get(n), d)) for n, d in desc[1]
        )
    if kind in ("array", "set"):
        inner = ",".join(render_zson(x, desc[1]) for x in v)
        return "[%s]" % inner if kind == "array" else "|[%s]|" % inner
    if kind == "map":
        return "|{%s}|" % ",".join(
            "%s:%s" % (render_zson(k, desc[1]), render_zson(x, desc[2]))
            for k, x in v.items()
        )
    name = desc[1]
    if name == "string":
        return '"%s"' % str(v).replace("\\", "\\\\").replace('"', '\\"')
    if name == "bool":
        return "true" if v else "false"
    if name in ("float64", "float32", "float16"):
        from zed_spark.functions.zfloat import format_float32, format_float64

        fmt = format_float64 if name == "float64" else format_float32
        txt = fmt(float(v))
        return txt if name == "float64" else "%s(%s)" % (txt, name)
    if name == "time":
        from datetime import datetime, timezone

        if hasattr(v, "isoformat"):
            ts = v if v.tzinfo else v.replace(tzinfo=timezone.utc)
            return ts.strftime("%Y-%m-%dT%H:%M:%S.%f").rstrip("0").rstrip(
                "."
            ) + "Z"
        return "%dns(time)" % int(v)
    if name == "duration":
        return "%dns" % int(v)
    if name == "bytes":
        return "0x" + bytes(v).hex()
    if name in ("ip", "net"):
        return str(v)
    txt = str(int(v)) if name.startswith(("int", "uint")) else str(v)
    return txt if name == "int64" else "%s(%s)" % (txt, name)


# the VNG on-ramp decodes on the DRIVER (the format's segmaps are a
# single-file random-access layout; a distributed decode would ship
# the whole data section to every task anyway).  Interop-sized files
# only — past the gate, callers convert once to parquet/ZNG, the
# scale formats.  Override with SPARK_GRAFT_VNG_MAX_BYTES.
VNG_MAX_BYTES = int(
    __import__("os").environ.get(
        "SPARK_GRAFT_VNG_MAX_BYTES", str(512 << 20)
    )
)


def read_vng(spark, path: str):
    """VNG file → DataFrame: decode then re-enter through the fused
    ZSON reader so precise types and per-row shapes ride the same
    typed path every other format uses."""
    import os
    import tempfile

    from zed_spark.sources import fsio

    size = fsio.getsize(path)
    if size > VNG_MAX_BYTES:
        raise ValueError(
            f"vng: {path} is {size} bytes — the VNG reader "
            f"materializes on the driver and is gated at "
            f"{VNG_MAX_BYTES} bytes; convert to parquet or zng for "
            f"data at scale (or raise SPARK_GRAFT_VNG_MAX_BYTES)"
        )
    data = fsio.read_bytes(path)
    vals, typestrs = parse_vng(data)
    from zed_spark.sources.zson import read_zson_fused
    from zed_spark.sources.ztypes import parse_type_string

    fd, tmp = tempfile.mkstemp(suffix=".zson")
    try:
        with os.fdopen(fd, "w") as out:
            for v, ts in zip(vals, typestrs):
                out.write(render_zson(v, parse_type_string(ts)) + "\n")
        return read_zson_fused(spark, tmp)
    finally:
        os.unlink(tmp)
