"""flatten / unflatten / nest_dotted (reference:
runtime/sam/expr/function/flatten.go, unflatten.go, nestdotted.go).

flatten(r) → array of {key: array<string>, value} over all leaf
paths. Schema-driven (static), so it compiles to a native array
constructor — no UDF, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from zed_spark.schema import flat_paths, path_type


def _entry_array(leaves: list[tuple[list[str], Column, T.DataType]]) -> Column:
    """[(path, col, dtype)] → the zed flatten() value: array of
    {key: array<string>, value}. A uniform leaf type keeps the value
    typed; MIXED leaf types form a first-class tagged union (zed's
    flatten returns array of |(T1,...,Tn)| — flatten.md mixed
    example: value 1 stays int64 next to value "foo")."""
    sigs: list[T.DataType] = []
    seen: set[str] = set()
    for _p, _c, dt in leaves:
        if dt.simpleString() not in seen:
            seen.add(dt.simpleString())
            sigs.append(dt)
    if len(sigs) > 1:
        from zed_spark.union import union_type

        ut = union_type(*sigs)
        mtypes = [f.dataType for f in ut.fields[1:]]

        def wrap(c: Column, dt: T.DataType) -> Column:
            idx = next(
                i
                for i, mt in enumerate(mtypes)
                if mt.simpleString() == dt.simpleString()
            )
            return F.struct(
                F.lit(idx).alias("tag"),
                *[
                    (c if i == idx else F.lit(None).cast(mt)).alias(f"v{i}")
                    for i, mt in enumerate(mtypes)
                ],
            )

        leaves = [(p, wrap(c, dt), ut) for p, c, dt in leaves]
    return F.array(
        *[
            F.struct(
                F.array(*[F.lit(seg) for seg in p]).alias("key"),
                c.alias("value"),
            )
            for p, c, _dt in leaves
        ]
    )


def flatten_record(df: DataFrame, columns: list[str] | None = None) -> Column:
    """Build the zed flatten() value for a row (function/flatten.go)."""
    schema = df.schema
    if columns:
        schema = T.StructType([schema[c] for c in columns])
    leaves = [
        (path.split("."), F.col(path), path_type(schema, path))
        for path in flat_paths(schema)
    ]
    return _entry_array(leaves)


def flatten_col(col: Column, dt: T.DataType) -> Column:
    """flatten() over an arbitrary record-typed expression: walk the
    static struct type, emitting {key: array<string>, value} per
    leaf, values typed (union when mixed)."""
    leaves: list[tuple[list[str], Column, T.DataType]] = []

    def walk(c: Column, t: T.DataType, path: list[str]):
        if isinstance(t, T.StructType) and not (
            t.fields and t.fields[0].name == "tag"
        ):
            for f in t.fields:
                walk(c.getField(f.name), f.dataType, path + [f.name])
            return
        leaves.append((path, c, t))

    walk(col, dt, [])
    return _entry_array(leaves)


def unflatten(df: DataFrame, flat: Column) -> Column:
    """Inverse of flatten: array<{key,value}> → map (dotted keys).
    Returns a MapType value (zed rebuilds a record; our dynamic analog
    is a map, since Spark structs are static)."""
    return F.map_from_entries(
        F.transform(flat, lambda e: F.struct(F.array_join(e.getField("key"), ".").alias("key"),
                                             e.getField("value").alias("value")))
    )


def nest_dotted_col(col: Column, dt: T.StructType) -> Column:
    """nest_dotted over a record-typed expression: a.b-style FIELD
    NAMES become nested records (nestdotted.go), schema-driven."""
    tree: dict = {}
    for f in dt.fields:
        parts = f.name.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = col.getField(f.name)

    def build(node) -> Column:
        if isinstance(node, Column):
            return node
        return F.struct(*[build(v).alias(k) for k, v in node.items()])

    return build(tree)


def nest_dotted(df: DataFrame) -> DataFrame:
    """Turn a.b-style flat COLUMN NAMES into nested records
    (nestdotted.go). Purely schema-driven."""
    tree: dict = {}
    order: list[str] = []
    for c in df.columns:
        parts = c.split(".")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = F.col(f"`{c}`")
        if parts[0] not in order:
            order.append(parts[0])

    def build(node) -> Column:
        if isinstance(node, Column):
            return node
        return F.struct(*[build(v).alias(k) for k, v in node.items()])

    return df.select(*[build(tree[name]).alias(name) for name in order])
