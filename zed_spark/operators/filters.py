"""where / filter (reference: runtime/sam/expr/filter.go:250-259).

Search-expression sugar (bare terms matching any field, reference:
docs/language/search-expressions.md) is provided by ``search``:
a predicate over the JSON rendering of the whole row. Correct but
slow by design — the reference accelerates with a byte-level
prescan (bufferfilter.go); our fast path is a normal column
predicate, which Catalyst pushes into the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def where(df: DataFrame, predicate: Column | str) -> DataFrame:
    """Keep rows where predicate is true. Accepts a Column or a SQL
    expression string (``df.filter`` handles both; Catalyst pushes
    simple predicates into the scan)."""
    return df.filter(predicate)


_SIMPLE_SEARCH_TYPES = (
    "string", "long", "integer", "short", "byte", "double", "float",
    "boolean",
)
# terms containing JSON structure characters can match across the
# rendered syntax — those keep the JSON-blob scan
_JSON_META = set('{}[]"\\:,')


def search_pred(df: DataFrame, term: str, case_sensitive: bool = False) -> Column:
    """Predicate form of `search` — usable inside composed search
    expressions (`widget and price > 1000`).

    FLAT-SCHEMA FAST PATH (round-3 VERDICT item 6): when every column
    is a simple scalar and the term carries no JSON metacharacters,
    the search compiles to an OR of per-column predicates — string
    columns substring-match, numeric/bool columns match their
    rendered text, and a field NAME containing the term matches rows
    where that field is present. All whole-stage-codegen; no to_json
    of the row. Nested/complex schemas (or structural terms) keep the
    JSON-blob scan, which is semantics-equivalent by construction."""
    fields = [f for f in df.schema.fields if not f.name.startswith("__zed_")]
    if fields and all(
        f.dataType.typeName() in _SIMPLE_SEARCH_TYPES for f in fields
    ) and not (_JSON_META & set(term)):
        t = term if case_sensitive else term.lower()
        preds = []
        for f in fields:
            c = F.col(f"`{f.name}`")
            if f.dataType.typeName() == "string":
                v = c if case_sensitive else F.lower(c)
            else:
                # numbers/bools render in JSON exactly as their
                # string cast (Jackson and Spark both use the Java
                # toString forms)
                v = c.cast("string")
                if not case_sensitive:
                    v = F.lower(v)
            preds.append(F.coalesce(v.contains(t), F.lit(False)))
            name = f.name if case_sensitive else f.name.lower()
            if t in name:
                preds.append(c.isNotNull())
        return _any(preds)
    blob = F.to_json(
        F.struct(
            *[F.col(c) for c in df.columns if not c.startswith("__zed_")]
        )
    )
    if not case_sensitive:
        blob = F.lower(blob)
        term = term.lower()
    return blob.contains(term)


def search(df: DataFrame, term: str, case_sensitive: bool = False) -> DataFrame:
    """Bare-word search across ALL fields (recursively), zed's
    implied-search semantics. Implemented over to_json(struct(*))."""
    return df.filter(search_pred(df, term, case_sensitive))


def search_regex(df: DataFrame, pattern: str) -> DataFrame:
    """Regexp search across all fields (zed ``/re/`` search term)."""
    blob = F.to_json(
        F.struct(
            *[F.col(c) for c in df.columns if not c.startswith("__zed_")]
        )
    )
    return df.filter(blob.rlike(pattern))


def search_net_pred(df: DataFrame, cidr: str) -> Column:
    """Net-literal search (zed `192.168.2.0/24` filter): matches rows
    holding an ip INSIDE the net or the net value itself, anywhere in
    the record including inside arrays (search.go net match over
    walked values). Schema-directed: only string-ish leaves are
    probed, all JVM-side."""
    from zed_spark.functions.ip import cidr_match

    def hit(col):
        return F.coalesce((col == cidr) | cidr_match(cidr, col), F.lit(False))

    def walk(col, dt) -> list:
        t = dt.typeName()
        if t == "string":
            return [hit(col)]
        if t == "struct":
            return [
                p
                for f in dt.fields
                for p in walk(col.getField(f.name), f.dataType)
            ]
        if t == "array" and dt.elementType.typeName() == "string":
            return [F.coalesce(F.exists(col, hit), F.lit(False))]
        return []

    preds = []
    for f in df.schema.fields:
        if f.name.startswith("__zed_"):
            continue
        preds.extend(walk(F.col(f.name), f.dataType))
    if not preds:
        return F.lit(False)
    out = preds[0]
    for p in preds[1:]:
        out = out | p
    return out


def search_net(df: DataFrame, cidr: str) -> DataFrame:
    return df.filter(search_net_pred(df, cidr))


def _string_leaf_preds(df: DataFrame, hit) -> list:
    """Predicates from `hit(col)` applied to every string leaf
    (recursing into structs and arrays) — the walked-value shape of
    zed implied search (search.go walks each value)."""

    def walk(col, dt) -> list:
        t = dt.typeName()
        if t == "string":
            return [F.coalesce(hit(col), F.lit(False))]
        if t == "struct":
            return [
                p for f in dt.fields for p in walk(col.getField(f.name), f.dataType)
            ]
        if t == "array":
            et = dt.elementType
            if et.typeName() == "string":
                return [F.coalesce(F.exists(col, hit), F.lit(False))]
            if et.typeName() == "struct":
                sub = []
                for f in et.fields:
                    if f.dataType.typeName() == "string":
                        sub.append(f.name)
                def elem_pred(names):
                    # single-param lambda: pyspark's higher-order
                    # bridge passes (elem, index) to 2-param lambdas
                    return lambda x: _any([hit(x.getField(n)) for n in names])

                return [
                    F.coalesce(
                        F.exists(col, elem_pred(tuple(sub))), F.lit(False)
                    )
                ] if sub else []
        return []

    preds = []
    for f in df.schema.fields:
        if f.name.startswith("__zed_"):
            continue
        preds.extend(walk(F.col(f.name), f.dataType))
    return preds


def _any(preds: list):
    if not preds:
        return F.lit(False)
    out = preds[0]
    for p in preds[1:]:
        out = out | p
    return out


def search_glob_pred(df: DataFrame, glob: str) -> Column:
    """Glob search (`foo*`): matches a string VALUE matching the glob
    anywhere in the record, or a FIELD NAME matching the glob whose
    value is present (search.go matches walked values and field
    names). Field names are static schema, so the name side compiles
    to presence checks — zero runtime string work."""
    import re as _re

    from zed_spark.functions.grep import glob_to_regex

    # one pass: \x stays a literal char, unescaped */? become glob
    # wildcards
    out = []
    i = 0
    while i < len(glob):
        ch = glob[i]
        if ch == "\\" and i + 1 < len(glob):
            out.append(_re.escape(glob[i + 1]))
            i += 2
        elif ch == "*":
            out.append(".*")
            i += 1
        elif ch == "?":
            out.append(".")
            i += 1
        else:
            out.append(_re.escape(ch))
            i += 1
    rx = "^" + "".join(out) + "$"

    def hit(col):
        return col.rlike(rx)

    preds = _string_leaf_preds(df, hit)

    # field-name side: any schema path segment matching the glob →
    # rows where that field is non-null
    def name_walk(col, name, dt) -> list:
        from zed_spark.schema import is_union_type

        out = []
        if _re.fullmatch(rx, name):
            out.append(col.isNotNull())
        t = dt.typeName()
        if t == "struct":
            if is_union_type(dt):
                # union carriers: tag/v0/e1 are representation, not
                # record field names — walk the members anonymously
                for f in dt.fields[1:]:
                    if f.dataType.typeName() == "struct":
                        for g in f.dataType.fields:
                            out.extend(
                                name_walk(
                                    col.getField(f.name).getField(g.name),
                                    g.name,
                                    g.dataType,
                                )
                            )
                return out
            for f in dt.fields:
                out.extend(name_walk(col.getField(f.name), f.name, f.dataType))
        elif t == "array" and dt.elementType.typeName() == "struct":
            for f in dt.elementType.fields:
                if _re.fullmatch(rx, f.name):
                    def present(n):
                        return lambda x: x.getField(n).isNotNull()

                    out.append(
                        F.coalesce(
                            F.exists(col, present(f.name)), F.lit(False)
                        )
                    )
        return out

    for f in df.schema.fields:
        if not f.name.startswith("__zed_"):
            preds.extend(name_walk(F.col(f.name), f.name, f.dataType))
    return _any(preds)


def search_glob(df: DataFrame, glob: str) -> DataFrame:
    return df.filter(search_glob_pred(df, glob))


def _field_name_preds(df: DataFrame, matches) -> list[Column]:
    """Search terms also match FIELD NAMES: the reference's search
    walks the value's TYPE and matches each record field name
    (expr/filter.go searchType / search.go FieldNameIter), so
    `/(foo|bar)/` selects `{foo:1}`. A name match holds for rows
    where that field is present — isNotNull approximates the
    reference's per-row shape membership under the widened schema."""
    from pyspark.sql import types as T

    from zed_spark.schema import is_union_type

    out: list[Column] = []

    def walk(t, prefix="", anon=False):
        for f in t.fields:
            if f.name.startswith("__zed_"):
                continue
            p = f"{prefix}`{f.name}`"
            if isinstance(f.dataType, T.StructType) and is_union_type(
                f.dataType
            ):
                # union carrier: tag/v0/e1 are representation, not
                # record field names — walk members anonymously
                walk(f.dataType, p + ".", anon=True)
                continue
            if not anon and matches(f.name):
                out.append(F.col(p).isNotNull())
            if isinstance(f.dataType, T.StructType):
                walk(f.dataType, p + ".")

    walk(df.schema)
    return out


def search_regex_pred(df: DataFrame, pattern: str) -> Column:
    """Predicate form of the /re/ search term (values + field
    names, like the reference's searchByPred)."""
    import re as _re2

    try:
        rx = _re2.compile(pattern)
        name_preds = _field_name_preds(df, lambda n: bool(rx.search(n)))
    except _re2.error:
        name_preds = []
    return _any(
        _string_leaf_preds(df, lambda c: c.rlike(pattern)) + name_preds
    )


def search_regex_leaves(df: DataFrame, pattern: str) -> DataFrame:
    """/re/ search term: regexp match against every string leaf
    (search.go regex match over walked values)."""
    return df.filter(search_regex_pred(df, pattern))
