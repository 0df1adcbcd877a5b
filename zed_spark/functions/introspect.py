"""Type introspection (reference: runtime/sam/expr/function/types.go,
under.go; typeof/kind/is predicates function.go:112-158).

In zed these are per-VALUE (each value carries its type); in Spark
the schema is per-DataFrame, so they compile to literals/static
checks — free at runtime. `typeof` returns the zed-style type name.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SPARK_TO_ZED = {
    T.ByteType(): "int8",
    T.ShortType(): "int16",
    T.IntegerType(): "int32",
    T.LongType(): "int64",
    T.FloatType(): "float32",
    T.DoubleType(): "float64",
    T.BooleanType(): "bool",
    T.StringType(): "string",
    T.BinaryType(): "bytes",
    T.TimestampType(): "time",
    T.DateType(): "time",
    T.NullType(): "null",
}


def zed_type_name(t: T.DataType) -> str:
    if t in _SPARK_TO_ZED:
        return _SPARK_TO_ZED[t]
    if isinstance(t, T.StructType):
        import re as _re

        if (
            t.fields
            and t.fields[0].name == "tag"
            and all(_re.fullmatch(r"v\d+", f.name) for f in t.fields[1:])
            and len(t.fields) > 1
        ):
            # tagged-union struct (union.py) → zed union type syntax
            return "(" + ",".join(zed_type_name(f.dataType) for f in t.fields[1:]) + ")"
        inner = ",".join(f"{f.name}:{zed_type_name(f.dataType)}" for f in t.fields)
        return "{" + inner + "}"
    if isinstance(t, T.ArrayType):
        return f"[{zed_type_name(t.elementType)}]"
    if isinstance(t, T.MapType):
        return f"|{{{zed_type_name(t.keyType)}:{zed_type_name(t.valueType)}}}|"
    if isinstance(t, T.DecimalType):
        return "float64"
    return t.simpleString()


def typeof_col(df: DataFrame, path: str | None = None) -> Column:
    """typeof(e) → literal type-name string (static per DataFrame)."""
    from zed_spark.schema import path_type

    if path is None:
        # hidden bookkeeping columns are not part of the row's type
        t: T.DataType = T.StructType(
            [f for f in df.schema.fields if not f.name.startswith("__zed_")]
        )
    else:
        t = path_type(df.schema, path) or T.NullType()
    return F.lit(zed_type_name(t))


_KINDS = {
    "record": T.StructType, "array": T.ArrayType, "map": T.MapType,
}


def kind_of(df: DataFrame, path: str) -> Column:
    """kind(e): primitive | record | array | map (types.go kind)."""
    from zed_spark.schema import path_type

    t = path_type(df.schema, path)
    if t is None:
        return F.lit("error")
    for name, cls in _KINDS.items():
        if isinstance(t, cls):
            return F.lit(name)
    return F.lit("primitive")


def _canon_tname(s: str) -> str:
    """Compare type names under the documented widening (SURVEY
    §1.2): int8/16/32 and uint* ride as int64, float16/32 as float64,
    named types are structural."""
    import re

    s = re.sub(r"\bu?int(?:8|16|32|64)\b", "int64", s)
    s = re.sub(r"\bfloat(?:16|32)\b", "float64", s)
    s = re.sub(r"\b[A-Za-z_]\w*=", "", s)
    return s.replace(" ", "")


def is_type(df: DataFrame, path: str, type_name: str) -> Column:
    """is(e, <type>): static schema check (widening-canonical). The
    static match gates per-row on presence — a row without the field
    is not of the type (zson typedef-binding)."""
    from zed_spark.schema import path_type

    t = path_type(df.schema, path)
    if t is None or _canon_tname(zed_type_name(t)) != _canon_tname(type_name):
        return F.lit(False)
    return F.col(path).isNotNull()


def fields_of(df: DataFrame, path: str | None = None) -> Column:
    """fields(r): array of field-name paths of a record
    (function/fields.go) — static per schema."""
    from zed_spark.schema import path_type

    t: T.DataType = df.schema if path is None else (path_type(df.schema, path) or T.NullType())
    if not isinstance(t, T.StructType):
        return F.lit(None).cast("array<array<string>>")
    from zed_spark.schema import flat_paths

    return F.array(
        *[
            F.array(*[F.lit(p) for p in fp.split(".")])
            for fp in flat_paths(t)
        ]
    )


def fields_from_type_string(
    tstr: str | None, tv: str | None, vstr: str | None
) -> list | None:
    """Per-row fields(): field-name paths of the value's RECORD type
    (function/fields.go walks the type, so a typed-null record still
    yields its paths). tv is the denoted type when the value is a
    type VALUE (fields(<rec>) reflects the denoted record); for a
    union-typed row whose member is `type`, vstr (the value text) is
    the denoted type. Returns None for non-record targets → missing.
    Driver-light: runs over metadata-sized type strings only."""
    from zed_spark.sources.ztypes import parse_type_string

    def deref(d):
        while d[0] == "named":
            d = d[2]
        return d

    target = tv
    if target is None:
        if not tstr:
            return None
        try:
            d = deref(parse_type_string(tstr))
        except Exception:
            return None
        if d[0] == "union":
            recs = [
                m
                for m in (deref(x) for x in d[1])
                if m[0] == "record"
            ]
            if recs:
                d = recs[0]
            elif any(
                m == ("prim", "type") for m in (deref(x) for x in d[1])
            ) and vstr:
                target = vstr
                d = None
            else:
                return None
        if d is not None and d[0] != "record":
            return None
        if d is not None:
            out: list = []

            def walk(dd, pre):
                for n, t in dd[1]:
                    t2 = deref(t)
                    if t2[0] == "record":
                        walk(t2, pre + [n])
                    else:
                        out.append(pre + [n])

            walk(d, [])
            return out
    try:
        d = deref(parse_type_string(target))
    except Exception:
        return None
    if d[0] != "record":
        return None
    out2: list = []

    def walk2(dd, pre):
        for n, t in dd[1]:
            t2 = deref(t)
            if t2[0] == "record":
                walk2(t2, pre + [n])
            else:
                out2.append(pre + [n])

    walk2(d, [])
    return out2


def nameof(df: DataFrame, path: str) -> Column:
    """nameof(v): named-type name — Spark has no named types; the
    column's own name is the nearest analog (documented compromise,
    SURVEY §1.2 'named' row)."""
    return F.lit(path.split(".")[-1])


def under(e: Column) -> Column:
    """under(v): strip named/union/error wrappers (under.go) — our
    representations don't wrap, so under is the identity."""
    return e


def _union_members(t: T.DataType):
    """(tag-field?, member fields) of a tagged-union struct
    (union.py convention: tag + v*/e* alternatives), else None."""
    import re as _re

    if (
        isinstance(t, T.StructType)
        and t.fields
        and t.fields[0].name == "tag"
        and len(t.fields) > 1
        and all(_re.fullmatch(r"[ve]\d*", f.name) for f in t.fields[1:])
    ):
        return t.fields[1:]
    return None


def kind_expr(col: Column, t: T.DataType | None) -> Column:
    """kind(v) per value (function/kind.go): primitive | record |
    array | map | union | error. Static per type, except union
    carriers dispatch on the tag (e-alternatives are error values;
    a single v-member means the union only exists to carry errors,
    so the v side reports its member kind, not 'union')."""
    members = _union_members(t) if t is not None else None
    if members is not None:
        vmembers = [
            (i, f) for i, f in enumerate(members) if f.name.startswith("v")
        ]
        if len(vmembers) == 1:
            i, f = vmembers[0]
            inner = kind_expr(col.getField(f.name), f.dataType)
            return F.when(
                col.getField("tag") == i, inner
            ).otherwise(F.lit("error"))
        # a real zed union: e-members are still error values per row
        out = F.lit("union")
        for i, f in enumerate(members):
            if f.name.startswith("e"):
                out = F.when(
                    col.getField("tag") == i, F.lit("error")
                ).otherwise(out)
        return out
    if isinstance(t, T.StructType):
        return F.lit("record")
    if isinstance(t, T.ArrayType):
        return F.lit("array")
    if isinstance(t, T.MapType):
        return F.lit("map")
    return F.lit("primitive")


def has_error_expr(col: Column, t: T.DataType | None) -> Column:
    """has_error(v) (function/haserror.go): true when the value IS or
    CONTAINS an error — a static recursive walk over the type,
    checking union tags at runtime."""
    members = _union_members(t) if t is not None else None
    if members is not None:
        cond = F.lit(False)
        for i, f in enumerate(members):
            active = col.getField("tag") == i
            if f.name.startswith("e"):
                cond = cond | active
            else:
                inner = has_error_expr(col.getField(f.name), f.dataType)
                cond = cond | (active & inner)
        return F.coalesce(cond, F.lit(False))
    if isinstance(t, T.StructType):
        cond = F.lit(False)
        for f in t.fields:
            cond = cond | has_error_expr(col.getField(f.name), f.dataType)
        return F.coalesce(cond, F.lit(False))
    if isinstance(t, T.ArrayType):
        if _contains_error(t.elementType):
            return F.coalesce(
                F.exists(col, lambda x: has_error_expr(x, t.elementType)),
                F.lit(False),
            )
        return F.lit(False)
    if isinstance(t, T.MapType):
        if _contains_error(t.valueType):
            return F.coalesce(
                F.exists(
                    F.map_values(col),
                    lambda x: has_error_expr(x, t.valueType),
                ),
                F.lit(False),
            )
        return F.lit(False)
    return F.lit(False)


def _contains_error(t: T.DataType) -> bool:
    members = _union_members(t)
    if members is not None:
        return any(f.name.startswith("e") for f in members) or any(
            _contains_error(f.dataType) for f in members
        )
    if isinstance(t, T.StructType):
        return any(_contains_error(f.dataType) for f in t.fields)
    if isinstance(t, T.ArrayType):
        return _contains_error(t.elementType)
    if isinstance(t, T.MapType):
        return _contains_error(t.valueType)
    return False


def is_error_expr(col: Column, t: T.DataType | None) -> Column:
    """is_error(v): the value itself is an error (not merely contains
    one) — an active e-alternative on a union carrier."""
    members = _union_members(t) if t is not None else None
    if members is None:
        return F.lit(False)
    cond = F.lit(False)
    for i, f in enumerate(members):
        if f.name.startswith("e"):
            cond = cond | (col.getField("tag") == i)
    return F.coalesce(cond, F.lit(False))


def parse_zson(spark, s: Column, schema: str) -> Column:
    """Column-level parse_zson analog for JSON-shaped text: from_json
    with an explicit schema (stays in codegen). Full ZSON text parses
    through sources/zson.py (driver-side); the zed-language
    `parse_zson` function routes there via the compiler."""
    return F.from_json(s, schema)


def type_value_field(tstr: str | None, path: str) -> str | None:
    """Field access ON A TYPE VALUE: `<{foo:{bar:int64}}> | yield
    foo` emits <{bar:int64}> — the denoted record type's field type
    as a new type value (reference expr dot over type values,
    runtime/sam/expr/ztests/dot-record-type.yaml). Returns the
    rendered sub-type string, or None when the string isn't a record
    type or lacks the path (→ missing). Driver-light: runs as an
    Arrow UDF over metadata-sized type strings only."""
    if not tstr:
        return None
    try:
        from zed_spark.sources.ztypes import parse_type_string, render

        d = parse_type_string(tstr)
        for seg in path.split("."):
            while d[0] == "named":
                d = d[2]
            if d[0] != "record":
                return None
            nxt = None
            for n, t in d[1]:
                if n == seg:
                    nxt = t
                    break
            if nxt is None:
                return None
            d = nxt
        return render(d)
    except Exception:
        return None
