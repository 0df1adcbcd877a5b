"""Schema algebra: nested field paths, recursive type merge ("fuse").

The reference fuses heterogeneous record shapes into a superset type
(reference: runtime/sam/op/fuse/fuser.go:10-38 and the agg-side merge
in runtime/sam/expr/agg/schema.go). Spark DataFrames are homogeneous,
so fuse becomes a *metadata-only* recursive StructType merge plus a
projection that casts/fills each input to the merged type — no data
shuffle at all, which is the main reason this engine scales where the
reference buffers the whole stream (fuse.go:22 buffers to spill).

Field paths use dotted notation ("a.b.c") like the reference's
field.Path (reference: compiler/ast/dag/expr.go This/field paths).
"""

from __future__ import annotations

import warnings

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


class UnionTypeDowngrade(UserWarning):
    """Raised (as a warning) when fuse meets types the reference
    would join in a first-class union type (complex.go:290-330) and
    this engine instead downgrades to a string representation —
    surfacing the type loss instead of doing it silently."""

# ---------------------------------------------------------------------------
# numeric widening lattice (zed coercion order, SURVEY §1.2)
# ---------------------------------------------------------------------------

_NUMERIC_ORDER = [
    T.ByteType(),
    T.ShortType(),
    T.IntegerType(),
    T.LongType(),
    T.FloatType(),
    T.DoubleType(),
]


def _is_numeric(t: T.DataType) -> bool:
    return any(t == n for n in _NUMERIC_ORDER) or isinstance(t, T.DecimalType)


def is_union_type(t: T.DataType) -> bool:
    """The tagged-struct union convention (union.py): fields are
    (tag int, v0, v1, ...), optionally followed by error
    alternatives (e0, e1, ...) holding first-class zed error values
    (errors-are-data, docs/language/expressions.md). The tag indexes
    POSITIONALLY into the non-tag fields."""
    import re as _re

    return (
        isinstance(t, T.StructType)
        and len(t.fields) >= 2
        and t.fields[0].name == "tag"
        and all(
            _re.fullmatch(r"[ve]\d+", f.name) for f in t.fields[1:]
        )
    )


def union_alternatives(t: T.StructType) -> list[T.DataType]:
    return [f.dataType for f in t.fields[1:]]


def merge_types(
    a: T.DataType, b: T.DataType, path: str = "", unions: str = "string"
) -> T.DataType:
    """Least-upper-bound of two Spark types, zed-fuse style.

    - identical types → same
    - numerics → widened (int lattice, any float → double)
    - struct+struct → field-wise merge, a's field order first, then
      b's new fields appended (matches fuser.go merge order)
    - array+array / map+map → element/value merge
    - anything else (the reference would build a union type,
      complex.go:290-330) → StringType, documented representation
      compromise, surfaced per-column as a UnionTypeDowngrade
      warning so the type loss is visible.
    """
    if a == b:
        return a
    if isinstance(a, T.NullType):
        return b
    if isinstance(b, T.NullType):
        return a
    if unions == "tagged" and (is_union_type(a) or is_union_type(b)):
        # alternatives carry an is-error flag (e-named fields are
        # first-class error(T) members, complex.go:42-65); value and
        # error alternatives never merge with each other
        def flagged(t):
            if is_union_type(t):
                return [
                    (f.name.startswith("e"), f.dataType)
                    for f in t.fields[1:]
                ]
            return [(False, t)]

        alts = flagged(a)
        for flag, t in flagged(b):
            if (flag, t) in alts:
                continue
            # structurally-compatible alternatives MERGE instead of
            # multiplying members: {version:[int]} joining a union
            # holding {version:[(int,string)]} widens that member
            # (zson mixed-array) — only truly irreconcilable kinds
            # add a new alternative
            for i, (aflag, alt) in enumerate(alts):
                if aflag != flag:
                    continue
                cand = merge_types(alt, t, path, unions)
                if not is_union_type(cand):
                    alts[i] = (flag, cand)
                    break
            else:
                alts.append((flag, t))
        from zed_spark.union import union_type

        return union_type(
            *[t for f, t in alts if not f],
            errors=[t for f, t in alts if f],
        )
    if _is_numeric(a) and _is_numeric(b):
        if isinstance(a, T.DecimalType) or isinstance(b, T.DecimalType):
            return T.DoubleType()
        ia, ib = _NUMERIC_ORDER.index(a), _NUMERIC_ORDER.index(b)
        hi = _NUMERIC_ORDER[max(ia, ib)]
        # int64 + float32 → double to avoid precision loss
        if max(ia, ib) >= _NUMERIC_ORDER.index(T.FloatType()) and min(ia, ib) >= 2:
            return T.DoubleType()
        return hi
    if isinstance(a, T.StructType) and isinstance(b, T.StructType):
        fields: list[T.StructField] = []
        b_map = {f.name: f for f in b.fields}
        seen = set()
        for fa in a.fields:
            seen.add(fa.name)
            if fa.name in b_map:
                sub = f"{path}.{fa.name}" if path else fa.name
                fields.append(
                    T.StructField(
                        fa.name,
                        merge_types(fa.dataType, b_map[fa.name].dataType, sub, unions),
                        True,
                    )
                )
            else:
                fields.append(T.StructField(fa.name, fa.dataType, True))
        for fb in b.fields:
            if fb.name not in seen:
                fields.append(T.StructField(fb.name, fb.dataType, True))
        return T.StructType(fields)
    if isinstance(a, T.ArrayType) and isinstance(b, T.ArrayType):
        return T.ArrayType(
            merge_types(a.elementType, b.elementType, path + "[]", unions), True
        )
    if isinstance(a, T.MapType) and isinstance(b, T.MapType):
        return T.MapType(
            merge_types(a.keyType, b.keyType, path + "{key}", unions),
            merge_types(a.valueType, b.valueType, path + "{value}", unions),
            True,
        )
    if unions == "tagged":
        from zed_spark.union import union_type

        return union_type(a, b)
    # union-type fallback: textual representation — warn, don't be silent
    warnings.warn(
        f"fuse: irreconcilable types at {path or '<value>'}: "
        f"{a.simpleString()} vs {b.simpleString()} — represented as string "
        "(the reference would form a union type)",
        UnionTypeDowngrade,
        stacklevel=2,
    )
    return T.StringType()


def merge_schemas(schemas: list[T.StructType], unions: str = "string") -> T.StructType:
    out: T.DataType = T.StructType([])
    for s in schemas:
        out = merge_types(out, s, "", unions)
    assert isinstance(out, T.StructType)
    return out


def conform(df: DataFrame, target: T.StructType) -> DataFrame:
    """Project/cast df to the target schema, filling absent fields
    with typed nulls (the core of the ``fuse`` and ``shape`` ops)."""
    cols = []
    src = {f.name: f for f in df.schema.fields}
    for f in target.fields:
        if f.name in src:
            cols.append(_conform_col(F.col(f.name), src[f.name].dataType, f.dataType).alias(f.name))
        else:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
    return df.select(*cols)


def _conform_col(col: Column, src: T.DataType, dst: T.DataType) -> Column:
    if src == dst:
        return col
    if is_union_type(dst):
        from zed_spark.union import make_union

        alts = union_alternatives(dst)
        if is_union_type(src):
            # widen union → union: remap tags and carry alternatives
            src_alts = union_alternatives(src)
            tag = F.lit(None).cast("int")
            for j, st in enumerate(src_alts):
                tag = F.when(col.getField("tag") == j, F.lit(alts.index(st))).otherwise(tag)
            parts = [tag.alias("tag")]
            for k, at in enumerate(alts):
                if at in src_alts:
                    parts.append(
                        col.getField(f"v{src_alts.index(at)}").alias(f"v{k}")
                    )
                else:
                    parts.append(F.lit(None).cast(at).alias(f"v{k}"))
            return F.when(col.isNull(), F.lit(None).cast(dst)).otherwise(F.struct(*parts))
        if src in alts:
            i = alts.index(src)
        elif T.StringType() in alts:
            i, col = alts.index(T.StringType()), col.cast("string")
        else:
            i, col = 0, col.cast(alts[0])
        return F.when(col.isNull(), F.lit(None).cast(dst)).otherwise(
            make_union(i, col, len(alts), alts)
        )
    if isinstance(src, T.StructType) and isinstance(dst, T.StructType):
        src_map = {f.name: f for f in src.fields}
        parts = []
        for f in dst.fields:
            if f.name in src_map:
                parts.append(
                    _conform_col(col.getField(f.name), src_map[f.name].dataType, f.dataType).alias(
                        f.name
                    )
                )
            else:
                parts.append(F.lit(None).cast(f.dataType).alias(f.name))
        # preserve null-ness of the parent struct
        return F.when(col.isNull(), F.lit(None).cast(dst)).otherwise(F.struct(*parts))
    if isinstance(src, T.ArrayType) and isinstance(dst, T.ArrayType):
        return F.transform(col, lambda x: _conform_col(x, src.elementType, dst.elementType))
    return col.cast(dst)


# ---------------------------------------------------------------------------
# dotted-path access / update / drop on (possibly nested) columns
# ---------------------------------------------------------------------------


def path_col(path: str) -> Column:
    """Column for a dotted path."""
    return F.col(path)


def split_path(path: str) -> list[str]:
    """Dot-split honoring backtick-quoted components: `x.y` is one
    field NAMED x.y (quoted-key paths, this["x.y"])."""
    if "`" not in path:
        return path.split(".")
    parts: list[str] = []
    cur: list[str] = []
    inbt = False
    for ch in path:
        if ch == "`":
            inbt = not inbt
        elif ch == "." and not inbt:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    parts.append("".join(cur))
    return parts


def has_path(schema: T.StructType, path: str) -> bool:
    parts = split_path(path)
    cur: T.DataType = schema
    for p in parts:
        if not isinstance(cur, T.StructType) or p not in cur.fieldNames():
            return False
        cur = cur[p].dataType
    return True


def path_type(schema: T.StructType, path: str) -> T.DataType | None:
    parts = split_path(path)
    cur: T.DataType = schema
    for p in parts:
        if not isinstance(cur, T.StructType) or p not in cur.fieldNames():
            return None
        cur = cur[p].dataType
    return cur


def path_nullable(schema: T.StructType, path: str) -> bool:
    """Whether any step of `path` is nullable — i.e. whether a row
    could be absent/null at this path. Non-nullable paths are
    statically always-present, so per-row error('missing') handling
    is provably unnecessary for them."""
    parts = split_path(path)
    cur: T.DataType = schema
    for p in parts:
        if not isinstance(cur, T.StructType) or p not in cur.fieldNames():
            return True
        f = cur[p]
        if f.nullable:
            return True
        cur = f.dataType
    return False


def _set_in(col: Column, dt: T.DataType, parts: list[str], value: Column) -> Column:
    """New value for `col` (of type dt) with `parts` set to value.
    Creates intermediate records through nulls and replaces
    non-record intermediates, like the reference putter
    (putter.go — ztest op/put-nested: a.c.a:=3 on {a:{c:null}})."""
    if not parts:
        return value
    if not isinstance(dt, T.StructType):
        nested = value
        for q in reversed(parts):
            nested = F.struct(nested.alias(q))
        return nested
    p = parts[0]
    known = p in dt.fieldNames()
    sub_dt = dt[p].dataType if known else T.NullType()
    inner = _set_in(
        col.getField(p) if known else F.lit(None), sub_dt, parts[1:], value
    )
    # a null record can't take withField — rebuild it as typed nulls
    base = F.when(col.isNotNull(), col).otherwise(
        F.struct(
            *[F.lit(None).cast(f.dataType).alias(f.name) for f in dt.fields]
        )
    )
    return base.withField(f"`{p}`", inner)


def set_path(df: DataFrame, path: str, value: Column) -> DataFrame:
    """withColumn that understands nested dotted paths (zed ``put``,
    reference: runtime/sam/expr/putter.go)."""
    parts = split_path(path)
    if len(parts) == 1:
        # parts[0], not path: quoted components arrive as `x.y` and
        # the real column name has no backticks
        return df.withColumn(parts[0], value)
    top = parts[0]
    if top not in df.columns:
        # build the nesting from scratch
        nested: Column = value
        for p in reversed(parts[1:]):
            nested = F.struct(nested.alias(p))
        return df.withColumn(top, nested)
    dt = df.schema[top].dataType
    return df.withColumn(top, _set_in(F.col(top), dt, parts[1:], value))


def drop_path(df: DataFrame, path: str) -> DataFrame:
    """drop that understands nested dotted paths (zed ``drop``,
    reference: runtime/sam/expr/dropper.go)."""
    parts = split_path(path)
    if len(parts) == 1:
        return df.drop(path)
    top = parts[0]
    if top not in df.columns:
        return df
    col = F.col(top).dropFields(".".join(f"`{p}`" for p in parts[1:]))
    return df.withColumn(top, col)


def project_paths(df: DataFrame, paths: list[tuple[str, str | None]]) -> DataFrame:
    """zed ``cut``: keep only the listed (possibly nested) paths,
    preserving nesting structure (reference: runtime/sam/expr/cutter.go).

    paths: list of (path, alias_or_None).  ``cut a.b`` yields a record
    {a:{b:...}}; ``cut c:=a.b`` yields {c:...}.
    """
    # group by top-level output name, build nested structs
    tree: dict = {}
    order: list[str] = []
    for path, alias in paths:
        parts = split_path(alias) if alias else split_path(path)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
            if not isinstance(node, dict):
                raise ValueError(f"conflicting cut paths at {p}")
        node[parts[-1]] = F.col(path)
        if parts[0] not in order:
            order.append(parts[0])

    def build(node) -> Column:
        if isinstance(node, Column):
            return node
        return F.struct(*[build(v).alias(k) for k, v in node.items()])

    return df.select(*[build(tree[name]).alias(name) for name in order])


def rename_path(df: DataFrame, old: str, new: str) -> DataFrame:
    """zed ``rename new:=old`` — must stay within the same record
    (reference: runtime/sam/expr/renamer.go:139)."""
    old_parts, new_parts = split_path(old), split_path(new)
    if old_parts[:-1] != new_parts[:-1]:
        raise ValueError("rename cannot move fields between records (zed semantics)")
    if len(old_parts) == 1:
        return df.withColumnRenamed(old, new)
    top = old_parts[0]
    inner = ".".join(f"`{p}`" for p in old_parts[1:])
    col = F.col(top).withField(
        ".".join(f"`{p}`" for p in new_parts[1:]), F.col(".".join(old_parts))
    ).dropFields(inner)
    return df.withColumn(top, col)


def flat_paths(schema: T.StructType, prefix: str = "") -> list[str]:
    """All leaf paths of a schema in order."""
    out: list[str] = []
    for f in schema.fields:
        p = f"{prefix}{f.name}"
        if isinstance(f.dataType, T.StructType):
            out.extend(flat_paths(f.dataType, p + "."))
        else:
            out.append(p)
    return out
