"""Driver-side ZSON/value ingestion with full zed data-model fidelity.

Builds a DataFrame from parsed zed values carrying the hidden sidecar
columns the rest of the engine consults:

- ``__zed_missing``  — per-row dotted paths that were ABSENT in the
  input record (vs present-but-null), zed missing semantics
  (reference context.go:494); writers drop these fields per row.
- ``__zed_types``    — per-row {dotted path -> zed type string} for
  identity a single widened Spark schema erases (named types, sized
  ints, ip/net/duration, unions, sets, enums); typeof/is/nameof and
  the exact-format writers consult it.
- ``__zed_ns_<col>`` — int64 ns shadows for time columns with sub-us
  precision (nano.Ts, reference value.go:84) so lake objects keep the
  reference's exact bytes.

Shared by the service load path and the ztest harness."""

from __future__ import annotations

import re as _re


def missing_paths(v, t, prefix="") -> list[str]:
    """Dotted paths the merged schema has but THIS value lacks — the
    per-row absent-vs-null distinction the widened model otherwise
    erases (zed missing semantics, context.go:494). Only the topmost
    absent segment is recorded; access checks walk the prefix
    chain."""
    from pyspark.sql import types as T

    from zed_spark.sources.zson import ZMap

    out: list[str] = []
    if (
        isinstance(t, T.StructType)
        and isinstance(v, dict)
        and not isinstance(v, ZMap)
    ):
        for f in t.fields:
            p = f"{prefix}{f.name}"
            if f.name not in v:
                out.append(p)
            elif v[f.name] is None:
                # UNTYPED null (`null`, not null(string)): its type
                # is unknown, so typed functions reject it while a
                # typed null passes (ztest levenshtein)
                out.append(p + "\x00null")
            else:
                out.extend(missing_paths(v[f.name], f.dataType, p + "."))
    return out


def to_df(spark, values, tdescs=None, ns_shadows=None):
    from pyspark.sql import types as T

    from zed_spark.sources.zson import ZMap, _conform, _finalize, _infer_type, _merge_type

    if tdescs is not None and len(tdescs) == len(values):
        # ZNG set normalization happens at value-creation time in the
        # reference (complex.go NormalizeSet): stored set order is
        # the element encoding order, union-resolved per element
        from zed_spark.sources.restore import normalize_sets_in_place

        for v, d in zip(values, tdescs):
            try:
                normalize_sets_in_place(v, d)
            except Exception:
                pass
    records = all(isinstance(v, dict) and not isinstance(v, ZMap) for v in values)
    if not records:
        values = [{"this": v} for v in values]
    t = T.NullType()
    for v in values:
        t = _merge_type(t, _infer_type(v))
    t = _finalize(t)
    rows = [_conform(v, t) for v in values]
    miss = None
    if records and isinstance(t, T.StructType):
        miss = [missing_paths(v, t) for v in values]
    elif isinstance(t, T.StructType) and len(t.fields) == 1:
        # wrapped mixed stream ({this: v}): record VALUES inside the
        # this-union still have per-row presence against the union's
        # record member type
        from zed_spark.schema import is_union_type as _iu

        this_t = t.fields[0].dataType
        if isinstance(this_t, T.StructType) and _iu(this_t):
            rec_members = [
                f.dataType
                for f in this_t.fields[1:]
                if f.name.startswith("v")
                and isinstance(f.dataType, T.StructType)
            ]
            if len(rec_members) == 1:
                miss = [
                    missing_paths(v["this"], rec_members[0])
                    if isinstance(v["this"], dict)
                    and not isinstance(v["this"], ZMap)
                    else []
                    for v in values
                ]
    if miss is not None and any(miss):
        # mixed-shape stream: carry per-row presence in a hidden
        # column so absent fields can yield error("missing")
        # while present-but-null fields stay null
        t = T.StructType(
            list(t.fields)
            + [T.StructField("__zed_missing", T.ArrayType(T.StringType()))]
        )
        rows = [r + (m,) for r, m in zip(rows, miss)]
    tmaps = type_maps(values, tdescs, records)
    if records and isinstance(t, T.StructType):
        # per-row FIELD ORDER: distinct orders are distinct zed record
        # types; the fused schema's merge order erases them.  Recorded
        # under an aux key in the type sidecar when any row's own
        # order differs from the schema-filtered order.
        merged_names = [f.name for f in t.fields]
        orders = [list(v.keys()) for v in values]
        if any(
            o != [n for n in merged_names if n in set(o)] for o in orders
        ):
            if tmaps is None:
                tmaps = [{} for _ in values]
            for m, o in zip(tmaps, orders):
                m["\x00order"] = ",".join(o)
    if tmaps is not None:
        # per-row TYPE IDENTITY sidecar (ztypes.py): attached only
        # when some row's precise type (named types, sized ints,
        # ip/net/duration identity) differs from what static
        # inference would say — typeof/is/nameof consult it per row
        t = T.StructType(
            list(t.fields)
            + [
                T.StructField(
                    "__zed_types", T.MapType(T.StringType(), T.StringType())
                )
            ]
        )
        rows = [r + (m,) for r, m in zip(rows, tmaps)]
    if ns_shadows:
        # ns-exact int64 time shadows for the lake load path: object
        # size/stat goldens are ns-resolution (nano.Ts, value.go:84)
        # while Spark timestamps truncate to µs
        for col, ns_vals in ns_shadows.items():
            t = T.StructType(
                list(t.fields)
                + [T.StructField(f"__zed_ns_{col}", T.LongType())]
            )
            rows = [r + (nv,) for r, nv in zip(rows, ns_vals)]
    return spark.createDataFrame(rows, t), (not records)


def ns_shadows_of(blob, vals) -> dict | None:
    """For a lake-load input with sub-µs time precision, re-parse at
    ns and return {top-level time field → [int64 ns per row]} so the
    object keeps the exact ns values the reference stores (nano.Ts)."""
    from datetime import datetime as _dt

    if not (
        isinstance(blob, str)
        and _re.search(r"\d{2}:\d{2}:\d{2}\.\d{7,}", blob)
    ):
        return None
    try:
        from zed_spark.sources.zson import parse_zson_typed as _pzt9

        vals_ns, _ = _pzt9(blob, time_ns=True)
    except Exception:
        return None
    if len(vals_ns) != len(vals) or not all(
        isinstance(v, dict) for v in vals
    ):
        return None
    cols: dict = {}
    names = {k for v in vals for k in v}
    for c in sorted(names):
        has_time = any(isinstance(v.get(c), _dt) for v in vals)
        clean = all(
            v.get(c) is None or isinstance(v.get(c), _dt) for v in vals
        )
        if not (has_time and clean):
            continue
        nsv = [
            v.get(c) if isinstance(v, dict) else None for v in vals_ns
        ]
        if all(x is None or isinstance(x, int) for x in nsv):
            cols[c] = nsv
    return cols or None


def type_maps(values, tdescs, records: bool):
    """Per-row {dotted path → zed type string} maps, or None when the
    descriptors add nothing beyond widened static inference."""
    if tdescs is None or len(tdescs) != len(values):
        return None
    from zed_spark.functions.introspect import zed_type_name
    from zed_spark.sources.zson import _finalize, _infer_type
    from zed_spark.sources.ztypes import path_descs, render

    need = False
    renders: set = set()
    maps: list[dict] = []
    for v, d in zip(values, tdescs):
        precise = render(d)
        renders.add(precise)
        if not need:
            try:
                static = zed_type_name(_finalize(_infer_type(v)))
            except Exception:
                static = None
            # informative when a row's precise type differs from its
            # own widened static inference (named/sized/ip identity)
            if precise != static:
                need = True
        if records:
            m = {}
            for p, dd in path_descs(d).items():
                m[p] = render(dd)
                if dd[0] == "typeval":
                    # type VALUES carry their denoted type under an
                    # aux key so kind()/nameof() see through them
                    m["\x00tv:" + p] = render(dd[1])
        else:
            m = {"": precise}
            if d[0] == "typeval":
                m["\x00tv:"] = render(d[1])
        maps.append(m)
    if len(renders) > 1:
        # rows differ from each other: per-row identity that a single
        # merged schema erases (const-type-is)
        need = True
    return maps if need else None


import re as _re

# type-value strings compare under the engine's documented widening
# (SURVEY §1.2): int8/16/32 and uint* ride as int64, float16/32 as
# float64, named types and set-ness are structural. Both sides of the
# compare pass through the same rewrite, so data strings that happen
# to look like type syntax stay consistent.
_TYPE_INT = _re.compile(r"\bu?int(?:8|16|32|64)\b")
_TYPE_FLOAT = _re.compile(r"\bfloat(?:16|32)\b")
_TYPE_NAMED = _re.compile(r"\b[A-Za-z_]\w*=")




_ZSON_INGEST_MAX_BYTES = int(
    __import__("os").environ.get(
        "SPARK_GRAFT_ZSON_INGEST_MAX_BYTES", str(256 * 1024 * 1024)
    )
)


def zson_text_to_df(spark, text: str):
    """One-stop driver-side ZSON ingest: parse + sidecars.

    Returns (DataFrame, wrapped) where wrapped is True when the input
    was a non-record value stream carried in a ``this`` column.

    ZSON is a human-readable text format parsed row-by-row on the
    driver (the reference parses it single-goroutine too,
    zson/parser.go) — fine for request-bounded HTTP loads, wrong for
    bulk data. The size gate mirrors the VNG gates: past it, the
    parquet/CSV/JSON readers stay fully distributed."""
    from zed_spark.sources.zson import parse_zson_typed
    from zed_spark.sources.ztypes import parse_types

    if len(text) > _ZSON_INGEST_MAX_BYTES:
        raise ValueError(
            f"zson ingest: input exceeds {_ZSON_INGEST_MAX_BYTES} bytes "
            f"— ZSON text parses on the driver; load parquet/csv/json "
            f"for data at scale (or raise "
            f"SPARK_GRAFT_ZSON_INGEST_MAX_BYTES)"
        )
    vals, _named = parse_zson_typed(text)
    if not vals:
        raise ValueError("no records found")
    nd: dict = {}
    try:
        descs = parse_types(text, nd)
    except Exception:
        descs = None
    return to_df(spark, vals, descs, ns_shadows=ns_shadows_of(text, vals))
