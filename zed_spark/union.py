"""Union types — the tagged-struct representation (SURVEY §1.2).

zed unions are first-class tagged sums (reference: complex.go:
290-330). Spark has no native sum type; the documented compromise:

    union(T0, T1, ...) → struct<tag:int, v0:T0, v1:T1, ...>

with exactly one non-null vN per value. Helpers here build/inspect
union values; `fuse` avoids creating unions wherever widening works
(merge_types falls back to StringType for irreconcilable leaves —
use these helpers when the textual fallback loses too much).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


# canonical member order follows the reference's primitive type IDs
# (type.go:106-137: uints < ints < duration/time < floats < bool <
# bytes < string < ip/net); complex types keep insertion order after
_ZED_TYPE_RANK = {
    T.ByteType(): 6, T.ShortType(): 7, T.IntegerType(): 8, T.LongType(): 9,
    T.TimestampType(): 13, T.FloatType(): 15, T.DoubleType(): 16,
    T.BooleanType(): 23, T.BinaryType(): 24, T.StringType(): 25,
}


def union_type(
    *types: T.DataType, errors: tuple | list = ()
) -> T.StructType:
    """Union struct; `errors` lists first-class ERROR alternatives
    (error(T) wrapper types, complex.go:42-65) — they ride as
    e-named fields after the value members, and every error-aware
    path (expr dispatch, writers, the ztest compare) resolves an
    e-tagged value to error(<member>)."""
    members = sorted(types, key=lambda t: _ZED_TYPE_RANK.get(t, 30))
    fields = [T.StructField("tag", T.IntegerType(), False)]
    fields += [T.StructField(f"v{i}", t, True) for i, t in enumerate(members)]
    n = len(members)
    fields += [
        T.StructField(f"e{n + j}", t, True) for j, t in enumerate(errors)
    ]
    return T.StructType(fields)


def make_union(tag: int, value: Column, arity: int, types: list[T.DataType]) -> Column:
    """Build a union value holding `value` at alternative `tag`."""
    parts: list[Column] = [F.lit(tag).alias("tag")]
    for i in range(arity):
        parts.append(
            (value if i == tag else F.lit(None)).cast(types[i]).alias(f"v{i}")
        )
    return F.struct(*parts)


def union_tag(u: Column) -> Column:
    """typeof-style dispatch on a union value (the reference's
    vector.Dynamic tag, vector/dynamic.go:10)."""
    return u.getField("tag")


def union_value(u: Column, tag: int) -> Column:
    """Extract alternative `tag` (null when the value holds another
    alternative) — zed's implicit union access."""
    return u.getField(f"v{tag}")


def union_unwrap(u: Column, arity: int) -> Column:
    """under(union) as a string rendering when alternatives must
    collapse to one column (the textual compromise)."""
    out = F.lit(None).cast("string")
    for i in range(arity):
        out = F.when(u.getField("tag") == i, u.getField(f"v{i}").cast("string")).otherwise(out)
    return out


def mixed_array(cols: list[tuple[int, Column]], types: list[T.DataType]) -> Column:
    """Array with mixed element types → array<union-struct>
    (zed `[1, "a", 2.5]`)."""
    arity = len(types)
    return F.array(*[make_union(tag, c, arity, types) for tag, c in cols])


def retag(col: Column, src_types: list[T.DataType], mtypes: list[T.DataType]) -> Column:
    """Re-wrap a union value into a WIDER union whose members are a
    superset: each source member maps to its slot in mtypes (flat
    union composition — zed unions never nest, complex.go)."""
    mapping = {i: mtypes.index(t) for i, t in enumerate(src_types)}
    tag_col: Column | None = None
    for i, j in mapping.items():
        w = F.when(col.getField("tag") == i, F.lit(j))
        tag_col = w.otherwise(tag_col) if tag_col is not None else w
    fields = [tag_col.alias("tag")]
    for j, mt in enumerate(mtypes):
        src = [i for i, jj in mapping.items() if jj == j]
        v = (
            col.getField(f"v{src[0]}")
            if src
            else F.lit(None).cast(mt)
        )
        fields.append(v.alias(f"v{j}"))
    return F.struct(*fields)
