"""over / explode — lateral iteration over complex values.

Reference:
  over    — runtime/sam/op/traverse/over.go:24 (+ scope.go: lateral
            subqueries with `with var=` bindings): iterate array
            elements / map entries / scalars, each becoming `this`
            for the subquery body.
  explode — runtime/sam/op/explode/explode.go:23: `explode by type T
            as name` — one output record per constituent value of
            type T.

Spark-first: explode()/posexplode() generators, which stay inside
whole-stage codegen. A lateral body that ends in an aggregation is
re-expressed as explode → groupBy(row id) → collect, or better, with
higher-order functions (transform/filter/aggregate) that never leave
the row — prefer ``over_expr`` when the body is expressible that way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def over_entries(col: Column, dtype: T.DataType) -> Column:
    """The sequence a value traverses to under `over` (over.go:89
    appendOver), as ONE array column ready for explode/posexplode:

      array/set → its elements
      map       → {key, value} records
      record    → {key:[name], value:<field>} per field — mixed field
                  types become a tagged union on `value`
      scalar    → a one-element array of the value itself
    """
    if isinstance(dtype, T.StructType) and _is_union(dtype):
        # union input: traverse the member the tag selects
        # (over.go val.Under()). Entry types per member must merge —
        # same-type entries merge plainly, otherwise each element
        # wraps into a tagged union of the member entry types.
        from zed_spark.union import make_union, retag, union_type

        members = [
            (f.name, f.dataType)
            for f in dtype.fields[1:]
            if f.name.startswith("v")
        ]
        elem_types: list[T.DataType] = []
        branches = []  # (pos, entries_col, elem_type)
        for pos, (nm, mdt) in enumerate(members):
            ent = over_entries(col.getField(nm), mdt)
            et = _entry_elem_type(mdt)
            branches.append((pos, ent, et))
            # zed unions never nest (complex.go): a union-typed entry
            # contributes its MEMBERS to the flat result union
            for leaf in (
                [f.dataType for f in et.fields[1:]]
                if isinstance(et, T.StructType) and _is_union(et)
                else [et]
            ):
                if leaf not in elem_types:
                    elem_types.append(leaf)
        if len(elem_types) == 1:
            out = F.array().cast(T.ArrayType(elem_types[0]))
            for pos, ent, _et in branches:
                out = F.when(col.getField("tag") == pos, ent).otherwise(out)
            return out
        ut = union_type(*elem_types)
        mtypes = [f.dataType for f in ut.fields[1:]]
        # closure factories: Spark passes (element, index) to
        # TWO-parameter lambdas, so a default-arg capture would bind
        # the index column instead of the tag
        def _wrap_at(tag: int):
            return lambda x: make_union(tag, x, len(mtypes), mtypes)

        def _retag_from(src: list):
            return lambda x: retag(x, src, mtypes)

        out = F.array().cast(T.ArrayType(ut))
        for pos, ent, et in branches:
            if isinstance(et, T.StructType) and _is_union(et):
                wrapped = F.transform(
                    ent, _retag_from([f.dataType for f in et.fields[1:]])
                )
            else:
                wrapped = F.transform(ent, _wrap_at(mtypes.index(et)))
            out = F.when(col.getField("tag") == pos, wrapped).otherwise(out)
        return out
    if isinstance(dtype, T.ArrayType):
        return col
    if isinstance(dtype, T.MapType):
        return F.transform(
            F.map_entries(col),
            lambda e: F.struct(e["key"].alias("key"), e["value"].alias("value")),
        )
    if isinstance(dtype, T.StructType) and not _is_union(dtype):
        from zed_spark.union import make_union, union_type

        distinct: list[T.DataType] = []
        for f in dtype.fields:
            if f.dataType not in distinct:
                distinct.append(f.dataType)
        if len(distinct) == 1:
            wrap = lambda c, t: c
        else:
            ut = union_type(*distinct)
            members = [fld.dataType for fld in ut.fields[1:]]
            wrap = lambda c, t: make_union(
                members.index(t), c, len(members), members
            )
        return F.array(
            *[
                F.struct(
                    F.array(F.lit(f.name)).alias("key"),
                    wrap(col.getField(f.name), f.dataType).alias("value"),
                )
                for f in dtype.fields
            ]
        )
    return F.array(col)


def _entry_elem_type(dt: T.DataType) -> T.DataType:
    """Element type of over_entries(col of dt)."""
    if isinstance(dt, T.ArrayType):
        return dt.elementType
    if isinstance(dt, T.MapType):
        return T.StructType(
            [
                T.StructField("key", dt.keyType),
                T.StructField("value", dt.valueType),
            ]
        )
    if isinstance(dt, T.StructType) and not _is_union(dt):
        distinct: list[T.DataType] = []
        for f in dt.fields:
            if f.dataType not in distinct:
                distinct.append(f.dataType)
        if len(distinct) == 1:
            vt = distinct[0]
        else:
            from zed_spark.union import union_type

            vt = union_type(*distinct)
        return T.StructType(
            [
                T.StructField("key", T.ArrayType(T.StringType())),
                T.StructField("value", vt),
            ]
        )
    return dt


def merge_entry_arrays(
    ents: list[Column], etypes: list[T.DataType]
) -> Column:
    """Concatenate entry arrays of possibly-different element types
    (`over a, b`, `over 1,2,"foo"`): same types concat plainly,
    mixed types wrap each element into a tagged union first."""
    distinct: list[T.DataType] = []
    for t in etypes:
        if t not in distinct:
            distinct.append(t)
    if len(distinct) == 1:
        return F.concat(*ents) if len(ents) > 1 else ents[0]
    from zed_spark.union import make_union, union_type

    ut = union_type(*distinct)
    mtypes = [f.dataType for f in ut.fields[1:]]

    def _wrap_at(tag: int):
        # single-parameter closure: a two-parameter lambda would
        # receive Spark's element INDEX as the second argument
        return lambda x: make_union(tag, x, len(mtypes), mtypes)

    wrapped = [
        F.transform(ent, _wrap_at(mtypes.index(et)))
        for ent, et in zip(ents, etypes)
    ]
    return F.concat(*wrapped)


def _is_union(dt: T.StructType) -> bool:
    import re

    return (
        len(dt.fields) >= 2
        and dt.fields[0].name == "tag"
        and all(re.fullmatch(r"v\d+", f.name) for f in dt.fields[1:])
    )


def over(
    df: DataFrame,
    expr: Column | str,
    with_vars: dict[str, Column] | None = None,
    keep: list[str] | None = None,
) -> DataFrame:
    """Iterate a container column: arrays explode to elements, maps
    explode to {key,value} records, records to {key,value} per field
    (over.go:89 appendOver). The element becomes column ``this``;
    `with` bindings become sibling columns usable by the downstream
    pipeline (scope.go).

    keep: parent columns to carry alongside (default: none, matching
    zed where the subquery sees only `this` + vars).
    """
    col = F.col(expr) if isinstance(expr, str) else expr
    dtype = df.select(col.alias("__c")).schema[0].dataType
    cols: list[Column] = [F.col(k) for k in (keep or [])]
    for name, v in (with_vars or {}).items():
        cols.append(v.alias(name))
    return df.select(*cols, F.explode(over_entries(col, dtype)).alias("this"))


def over_expr(arr: Column, fn) -> Column:
    """Lateral subquery as an expression when the body is a pure
    element-wise map: zed `over a |> ...` inside an expression
    (OverExpr, dag/expr.go:86-91) → higher-order transform()."""
    return F.transform(arr, fn)


def explode_op(
    df: DataFrame, *containers: str, type_filter: T.DataType | None = None, as_: str = "value"
) -> DataFrame:
    """zed `explode <exprs> by type T as name`: one output record per
    constituent value. Multiple containers concatenate."""
    cols = [F.col(c) for c in containers]
    merged = cols[0] if len(cols) == 1 else F.concat(*cols)
    out = df.select(F.explode(merged).alias(as_))
    if type_filter is not None:
        out = out.select(F.col(as_).cast(type_filter).alias(as_)).filter(F.col(as_).isNotNull())
    return out


def unnest_struct(df: DataFrame, path: str) -> DataFrame:
    """Flatten one struct column into top-level columns (helper for
    over-with-record semantics)."""
    other = [c for c in df.columns if c != path.split(".")[0]]
    return df.select(*other, f"{path}.*")
