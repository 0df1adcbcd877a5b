"""join — equi-joins in the reference's four styles.

Reference: runtime/sam/op/join/join.go (ordered merge join; sorts
injected on demand) and docs/language/operators/join.md:24-44 —
inner/left/right/anti, equi-keys only, right-side fields merged via
an explicit cut list.

Spark-first: we declare the join and let Catalyst choose
broadcast-hash / shuffle-hash / sort-merge. `auto_broadcast` adds an
explicit broadcast hint when one side is known-small (dimension
tables) — at 100 TB the fact side must never shuffle for a small-dim
join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_STYLES = {"inner": "inner", "left": "left", "right": "right", "anti": "left_anti"}


def join(
    left: DataFrame,
    right: DataFrame,
    left_key: str | Column,
    right_key: str | Column | None = None,
    style: str = "inner",
    cut: dict[str, str] | None = None,
    broadcast_right: bool = False,
    right_cols: bool = True,
) -> DataFrame:
    """Equi-join two pipeline legs.

    cut: {out_name: right_field} — the right-side fields to merge
    into the output (zed's `[field:=expr]` list). Anti joins take no
    cut list (join.go:19 anti flag disallows it). Omitted cut keeps
    all right columns (minus the join key duplicate) — the
    convenience default for the Python API; the language layer passes
    right_cols=False to match zed, where no cut list merges NOTHING
    from the right (join.md: "merged components from <right-expr>",
    ztest join/expr.yaml `on s` block).

    Key equality is null-safe: zed's merge join matches null keys to
    null keys (sort.go compareValues: null==null → 0; ztest
    first-key-is-null), unlike SQL where null never equals null.
    """
    if style not in _STYLES:
        raise ValueError(f"join style must be one of {sorted(_STYLES)}")
    if style == "anti" and cut:
        raise ValueError("anti join cannot merge right-side fields (zed semantics)")

    rk = right_key if right_key is not None else left_key
    lcol = F.col(left_key) if isinstance(left_key, str) else left_key
    rcol = F.col(rk) if isinstance(rk, str) else rk

    r = right
    if cut:
        # alias each cut source to a reserved flat name at select time:
        # a nested right-side path like 'a.b' selects as column 'b',
        # so referencing '__r.a.b' later would fail analysis. Sources
        # may arrive pre-compiled as Columns (language-level cut
        # expressions / absent fields resolved to null). The join key
        # itself needs the same flattening when it is a nested path
        # (`join on f.flavor=p.likes p:=p`, lake cross-pool-join).
        if isinstance(rk, str):
            flat = rk if "." not in rk else "__jkr"
            keep = [F.col(rk).alias(flat)]
            rk = flat
        else:
            keep = []
        r = right.select(
            *keep,
            *[
                (src if isinstance(src, Column) else F.col(src)).alias(f"__cut__{i}")
                for i, src in enumerate(cut.values())
            ],
        )
    if broadcast_right:
        r = F.broadcast(r)

    l_a, r_a = left.alias("__l"), r.alias("__r")
    cond = (
        F.col(f"__l.{left_key}").eqNullSafe(F.col(f"__r.{rk}"))
        if isinstance(left_key, str) and isinstance(rk, str)
        else lcol.eqNullSafe(rcol)
    )
    out = l_a.join(r_a, cond, _STYLES[style])

    if style == "anti":
        return out.select("__l.*")
    if cut:
        cols = [F.col(f"__l.{c}") for c in left.columns]
        cols += [
            F.col(f"__r.__cut__{i}").alias(dst) for i, dst in enumerate(cut.keys())
        ]
        return out.select(*cols)
    if not right_cols:
        # zed: no cut list → no right-side fields merged
        return out.select(*[F.col(f"__l.{c}") for c in left.columns])
    # API default: all left cols + right cols (drop duplicate key col)
    cols = [F.col(f"__l.{c}") for c in left.columns]
    cols += [F.col(f"__r.{c}") for c in r.columns if not (isinstance(rk, str) and c == rk)]
    return out.select(*cols)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str | None = None,
    style: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Skew-resistant equi-join: the left (large, skewed) side gets a
    random salt in [0, salt); the right side is replicated once per
    salt value, so one hot key spreads over `salt` reducers.

    AQE skew-join (enabled in the session) handles most skew at
    runtime; use this when a single key dominates so heavily that
    even split partitions blow past executor memory — the classic
    hot-key mitigation. Salt is derived from a hash of all left
    columns (deterministic, no rand()/seed state).
    """
    rk = right_key or left_key
    lsalt = F.pmod(F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt))
    l_s = left.withColumn("__salt", lsalt)
    r_s = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = l_s.join(
        r_s,
        (l_s[left_key] == r_s[rk]) & (l_s["__salt"] == r_s["__salt"]),
        {"inner": "inner", "left": "left"}[style],
    )
    keep = [l_s[c] for c in left.columns] + [
        r_s[c] for c in right.columns if c != rk
    ]
    return out.select(*keep)
