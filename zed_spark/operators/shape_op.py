"""Shaping operators: cast / crop / fill / order / shape / fit.

Reference: runtime/sam/expr/shaper.go:19-43 — composable bit-flag
transforms: cast (deep type cast), crop (drop fields not in target),
fill (null-fill missing fields), order (reorder to target), with
fit = crop|fill and shape = cast|fill|order. docs/language/shaping.md.

Spark-first: each is a recursive StructType-driven projection —
pure metadata planning, executed inside codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


_IP_RE = r"^((\d{1,3}\.){3}\d{1,3}|[0-9a-fA-F:]*:[0-9a-fA-F:]*)$"


def _cast_err(col: Column, ok: Column, fail: Column, vtype: T.DataType, msg: str,
              on_type: T.DataType) -> Column:
    """Value-level cast failure → first-class error value
    error({message, on:<operand>}) in a value|error carrier (zed
    castable errors, expr/cast.go; ztests shape-string-time-err,
    shape-cast-arrays)."""
    est = T.StructType(
        [
            T.StructField("message", T.StringType()),
            T.StructField("on", on_type),
        ]
    )
    ct = T.StructType(
        [
            T.StructField("tag", T.IntegerType()),
            T.StructField("v0", vtype),
            T.StructField("e1", est),
        ]
    )
    return F.struct(
        F.when(fail, F.lit(1)).otherwise(F.lit(0)).alias("tag"),
        F.when(~fail, ok).alias("v0"),
        F.when(
            fail,
            F.struct(F.lit(msg).alias("message"), col.alias("on")),
        ).alias("e1"),
    ).cast(ct)


def _zprim(zdst) -> str | None:
    """The zed primitive name of a shaping target, when known — the
    Spark DDL widens ip/net/time identity away, so per-value cast
    validation needs the original zed type threaded through."""
    return zdst[1] if isinstance(zdst, tuple) and zdst[0] == "prim" else None


def _project(
    col: Column,
    src: T.DataType,
    dst: T.DataType,
    *,
    cast: bool,
    crop: bool,
    fill: bool,
    order: bool,
    zdst=None,
) -> Column:
    if isinstance(dst, T.NullType):
        # the null type matches any source: shaping against it is the
        # identity (shaper.go null-type rule; ztest shape-fill-null)
        return col
    from zed_spark.schema import is_union_type

    if cast and is_union_type(dst):
        # cast TO union (castval.go union assembly): the value tags
        # into the member slot matching its runtime type; a null
        # stays the null union value (expr/ztests/shape-cast-to-union)
        dfields = dst.fields[1:]

        def _slot(t: T.DataType):
            for i2, f2 in enumerate(dfields):
                if f2.dataType.simpleString() == t.simpleString():
                    return i2
            num = ("byte", "short", "integer", "long", "double", "float")
            for i2, f2 in enumerate(dfields):
                if (
                    f2.dataType.typeName() in num
                    and t.typeName() in num
                ):
                    return i2
            return None

        def _wrap(v: Column, t: T.DataType) -> Column:
            i2 = _slot(t)
            if i2 is None:
                return F.lit(None).cast(dst)
            s2 = F.struct(
                F.lit(i2).alias("tag"),
                *[
                    (
                        v.cast(f2.dataType)
                        if j2 == i2
                        else F.lit(None).cast(f2.dataType)
                    ).alias(f2.name)
                    for j2, f2 in enumerate(dfields)
                ],
            ).cast(dst)
            return F.when(v.isNull(), F.lit(None).cast(dst)).otherwise(s2)

        if is_union_type(src):
            out = None
            for i2, f2 in enumerate(src.fields[1:]):
                cond2 = col.getField("tag") == F.lit(i2)
                v2 = _wrap(col.getField(f2.name), f2.dataType)
                out = (
                    F.when(cond2, v2)
                    if out is None
                    else out.when(cond2, v2)
                )
            return out.otherwise(F.lit(None).cast(dst))
        return _wrap(col, src)
    if is_union_type(src):
        efields = [f for f in src.fields[1:] if f.name.startswith("e")]
        if efields:
            # ERROR-carrying union (a prior cast pass already marked
            # failures): shapers propagate error values unchanged —
            # re-project only the value members, keep the carrier
            # layout (shaping.md re-shape of an already-shaped row)
            out_parts = [col.getField("tag").alias("tag")]
            for f in src.fields[1:]:
                if f.name.startswith("e"):
                    out_parts.append(col.getField(f.name).alias(f.name))
                else:
                    out_parts.append(
                        _project(
                            col.getField(f.name), f.dataType, dst,
                            cast=cast, crop=crop, fill=fill, order=order,
                            zdst=zdst,
                        ).alias(f.name)
                    )
            return F.when(col.isNotNull(), F.struct(*out_parts))
        # union source: shape each member, first non-null wins (the
        # reference shapes each value by its runtime type)
        parts = [
            _project(
                col.getField(f.name), f.dataType, dst,
                cast=cast, crop=crop, fill=fill, order=order, zdst=zdst,
            )
            for f in src.fields[1:]
        ]
        return F.coalesce(*parts)
    if cast and isinstance(src, T.StringType):
        # value-level cast validation for targets whose identity the
        # widened DDL erases (ip/net ride as strings) or whose parse
        # can fail per value (string → time)
        z = _zprim(zdst)
        if z in ("ip", "net"):
            fail = col.isNotNull() & ~col.rlike(_IP_RE)
            return _cast_err(
                col, col, fail, T.StringType(), f"cannot cast to {z}", src
            )
        if isinstance(dst, T.TimestampType):
            from zed_spark.functions.timeparse import flex_to_timestamp

            ok = flex_to_timestamp(col)
            fail = col.isNotNull() & ok.isNull()
            return _cast_err(col, ok, fail, dst, "cannot cast to time", src)
        if z in (
            "int8", "int16", "int32", "uint8", "uint16", "uint32",
            "uint64",
        ) and isinstance(
            dst, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)
        ):
            # string → SIZED-int field cast: unparsable values are
            # first-class cast errors, not silent nulls (shaping.md
            # shape() of vlan:"available" to uint16). Widened targets
            # (int64/float64) keep the plain cast so valid data stays
            # statically typed (shape-zson-typedef age:"52" → 52)
            ok = col.cast(dst)
            fail = col.isNotNull() & ok.isNull()
            return _cast_err(
                col, ok, fail, dst, f"cannot cast to {z}", src
            )
    if isinstance(src, T.StructType) and isinstance(dst, T.StructType):
        zmap = (
            dict(zdst[1])
            if isinstance(zdst, tuple) and zdst[0] == "recordtype"
            else {}
        )
        src_map = {f.name: f for f in src.fields}
        dst_map = {f.name: f for f in dst.fields}
        parts: list[Column] = []
        # choose field order: target order if ordering, else source order
        if order:
            names = [f.name for f in dst.fields if fill or f.name in src_map]
            extras = [] if crop else [f.name for f in src.fields if f.name not in dst_map]
            names += extras
        else:
            names = [f.name for f in src.fields if not crop or f.name in dst_map]
            if fill:
                names += [f.name for f in dst.fields if f.name not in src_map]
        for name in names:
            if name in src_map and name in dst_map:
                parts.append(
                    _project(
                        col.getField(name),
                        src_map[name].dataType,
                        dst_map[name].dataType,
                        cast=cast, crop=crop, fill=fill, order=order,
                        zdst=zmap.get(name),
                    ).alias(name)
                )
            elif name in src_map:
                parts.append(col.getField(name).alias(name))
            else:  # fill
                parts.append(F.lit(None).cast(dst_map[name].dataType).alias(name))
        return F.when(col.isNull(), F.lit(None)).otherwise(F.struct(*parts))
    if isinstance(src, T.ArrayType) and isinstance(dst, T.ArrayType):
        zel = (
            zdst[1]
            if isinstance(zdst, tuple) and zdst[0] in ("array", "settype")
            else None
        )
        out = F.transform(
            col,
            lambda x: _project(x, src.elementType, dst.elementType,
                               cast=cast, crop=crop, fill=fill, order=order,
                               zdst=zel),
        )
        if cast and isinstance(zdst, tuple) and zdst[0] == "settype":
            # casting an array to a SET deduplicates (complex.go
            # NormalizeSet; ztest shape-cast-array-to-set keeps the
            # first of each duplicate)
            out = F.array_distinct(out)
        if (
            cast
            and isinstance(zdst, tuple)
            and zdst[0] == "settype"
            and isinstance(zel, tuple)
            and zel[0] == "recordtype"
            and len(zel[1]) == 1
            and _zprim(dict(zel[1])[zel[1][0][0]]) in ("ip", "net")
        ):
            # set of single-field records: the post-cast zcode order
            # is null element < {f:null} < {f:value} < {f:error}
            # (shaper.go:501 NormalizeSet after the cast walk;
            # ztest shape-cast-sets row 4/5)
            fn = zel[1][0][0]

            def rcmp(a, b):
                def rank(x):
                    fld = x.getField(fn)
                    v0 = fld.getField("v0")
                    return (
                        F.when(x.isNull(), F.lit(0))
                        .when(
                            fld.isNull()
                            | ((fld.getField("tag") == 0) & v0.isNull()),
                            F.lit(1),
                        )
                        .when(fld.getField("tag") == 0, F.lit(2))
                        .otherwise(F.lit(3))
                    )

                ra, rb = rank(a), rank(b)
                va = F.coalesce(
                    a.getField(fn).getField("v0"), F.lit("")
                )
                vb = F.coalesce(
                    b.getField(fn).getField("v0"), F.lit("")
                )
                return (
                    F.when(ra < rb, F.lit(-1))
                    .when(ra > rb, F.lit(1))
                    .when(va < vb, F.lit(-1))
                    .when(va > vb, F.lit(1))
                    .otherwise(F.lit(0))
                )

            out = F.array_sort(out, rcmp)
        if (
            cast
            and isinstance(zdst, tuple)
            and zdst[0] == "settype"
            and _zprim(zel) in ("ip", "net")
        ):
            # a SET re-normalizes after cast (zcode element order,
            # complex.go NormalizeSet): nulls first, then values,
            # error elements last (their encoding is longest)
            def cmp(a, b):
                def rank(x):
                    return (
                        F.when(x.isNull(), F.lit(0))
                        .when(x.getField("tag") == 0, F.lit(1))
                        .otherwise(F.lit(2))
                    )

                ra, rb = rank(a), rank(b)
                va = F.coalesce(a.getField("v0"), F.lit(""))
                vb = F.coalesce(b.getField("v0"), F.lit(""))
                return (
                    F.when(ra < rb, F.lit(-1))
                    .when(ra > rb, F.lit(1))
                    .when(va < vb, F.lit(-1))
                    .when(va > vb, F.lit(1))
                    .otherwise(F.lit(0))
                )

            out = F.array_sort(out, cmp)
        return out
    if cast and src != dst:
        scalar = (
            "array", "map", "struct",
        )
        if (
            src.typeName() not in scalar
            and dst.typeName() in scalar
        ):
            # Spark rejects scalar→container casts at ANALYSIS time;
            # zed-wise these columns only arise from all-null
            # inference (`{array:null}` against a [string] target) —
            # the value becomes the typed null
            # (expr/ztests/shape-null-container)
            return F.lit(None).cast(dst)
        return col.cast(dst)
    return col


def _apply(df: DataFrame, target: T.StructType, zdst=None, **flags) -> DataFrame:
    src = df.schema
    row = F.struct(
        *[F.col(c) for c in df.columns if not c.startswith("__zed_")]
    )
    shaped = _project(row, src, target, zdst=zdst, **flags)
    # materialize the row struct back to top-level columns
    out_type = df.select(shaped.alias("__r")).schema[0].dataType
    assert isinstance(out_type, T.StructType)
    return df.select(shaped.alias("__r")).select("__r.*")


def cast_to(df: DataFrame, target: T.StructType, zdst=None) -> DataFrame:
    return _apply(df, target, zdst, cast=True, crop=False, fill=False, order=False)


def crop_to(df: DataFrame, target: T.StructType, zdst=None) -> DataFrame:
    return _apply(df, target, zdst, cast=False, crop=True, fill=False, order=False)


def fill_to(df: DataFrame, target: T.StructType, zdst=None) -> DataFrame:
    return _apply(df, target, zdst, cast=False, crop=False, fill=True, order=False)


def order_to(df: DataFrame, target: T.StructType, zdst=None) -> DataFrame:
    return _apply(df, target, zdst, cast=False, crop=False, fill=False, order=True)


def fit_to(df: DataFrame, target: T.StructType, zdst=None) -> DataFrame:
    """fit = crop | fill (shaper.go:37)."""
    return _apply(df, target, zdst, cast=False, crop=True, fill=True, order=False)


def shape_to(df: DataFrame, target: T.StructType, zdst=None) -> DataFrame:
    """shape = cast | fill | order (shaper.go:40)."""
    return _apply(df, target, zdst, cast=True, crop=False, fill=True, order=True)
