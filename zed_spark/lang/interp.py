"""Row-level interpreter for RECURSIVE user functions.

User funcs are normally macros expanded inline into Column
expressions (compiler.py — the reference compiles FuncDecl bodies
inline too). A recursive function has no finite inline expansion, so
the reference interprets calls at runtime (runtime/sam/expr/udf.go);
here the call compiles to a Python UDF running this interpreter over
the function-body AST per row (runtime/sam/expr/ztests/udf.yaml,
udf-mutual-recursion.yaml).

The supported expression subset is what function bodies use:
literals, parameter references, conditionals, arithmetic/comparison
operators, and calls to user functions or a few pure builtins. The
slow path only ever runs for recursive functions — everything else
stays JVM-side.
"""

from __future__ import annotations

_MAX_DEPTH = 10_000


class InterpError(ValueError):
    pass


def _truthy(v) -> bool:
    return bool(v) if v is not None else False


_BUILTINS = {
    "abs": abs,
    "len": lambda v: len(v) if v is not None else None,
    "lower": lambda s: s.lower() if isinstance(s, str) else None,
    "upper": lambda s: s.upper() if isinstance(s, str) else None,
    "floor": lambda v: float(int(v // 1)) if v is not None else None,
    "ceil": lambda v: float(-(-v // 1)) if v is not None else None,
}


def interp_eval(e, env: dict, funcs: dict, depth: int = 0):
    """Evaluate a parsed zed expression AST against a {param: value}
    environment, interpreting user-function calls recursively."""
    if depth > _MAX_DEPTH:
        raise InterpError("function recursion too deep")
    k = e[0]
    if k in ("num", "bool", "str"):
        return e[1]
    if k == "null":
        return None
    if k == "this":
        return env.get("this")
    if k == "field":
        cur = env.get(e[1][0])
        for p in e[1][1:]:
            cur = cur.get(p) if isinstance(cur, dict) else None
        return cur
    if k == "cond":
        return (
            interp_eval(e[2], env, funcs, depth + 1)
            if _truthy(interp_eval(e[1], env, funcs, depth + 1))
            else interp_eval(e[3], env, funcs, depth + 1)
        )
    if k == "neg":
        v = interp_eval(e[1], env, funcs, depth + 1)
        return -v if v is not None else None
    if k == "not":
        return not _truthy(interp_eval(e[1], env, funcs, depth + 1))
    if k == "bin":
        op = e[1]
        l = interp_eval(e[2], env, funcs, depth + 1)
        if op == "and":
            return _truthy(l) and _truthy(
                interp_eval(e[3], env, funcs, depth + 1)
            )
        if op == "or":
            return _truthy(l) or _truthy(
                interp_eval(e[3], env, funcs, depth + 1)
            )
        r = interp_eval(e[3], env, funcs, depth + 1)
        if op == "==":
            return l == r
        if op == "!=":
            return l != r
        if l is None or r is None:
            return None if op in ("+", "-", "*", "/", "%") else False
        if op == "<=":
            return l <= r
        if op == "<":
            return l < r
        if op == ">=":
            return l >= r
        if op == ">":
            return l > r
        if op == "+":
            return l + r
        if op == "-":
            return l - r
        if op == "*":
            return l * r
        if op == "/":
            if r == 0:
                raise InterpError("divide by zero")
            # zed int division truncates (expressions.md)
            return l // r if isinstance(l, int) and isinstance(r, int) else l / r
        if op == "%":
            if r == 0:
                raise InterpError("modulo by zero")
            return l % r
        raise InterpError(f"operator {op!r} not interpretable")
    if k == "call":
        name, args = e[1], e[2]
        vals = [interp_eval(a, env, funcs, depth + 1) for a in args]
        if name in funcs:
            params, body = funcs[name]
            if len(vals) != len(params):
                raise InterpError(
                    f"{name}() takes {len(params)} args, got {len(vals)}"
                )
            return interp_eval(body, dict(zip(params, vals)), funcs, depth + 1)
        fn = _BUILTINS.get(name)
        if fn is None:
            raise InterpError(f"function {name!r} not interpretable")
        return fn(*vals)
    raise InterpError(f"expression {k!r} not interpretable")


def static_type(e, param_types: dict, funcs: dict, stack: frozenset = frozenset()):
    """Best-effort Spark type of an interpreted body: the type of the
    first branch that resolves without re-entering a function already
    on the stack (the recursive branch eventually bottoms out in the
    base case, which fixes the type)."""
    from pyspark.sql import types as T

    k = e[0]
    if k == "num":
        return T.DoubleType() if isinstance(e[1], float) else T.LongType()
    if k == "bool":
        return T.BooleanType()
    if k == "str":
        return T.StringType()
    if k == "field":
        return param_types.get(e[1][0])
    if k == "this":
        return param_types.get("this")
    if k == "cond":
        return static_type(e[2], param_types, funcs, stack) or static_type(
            e[3], param_types, funcs, stack
        )
    if k in ("neg",):
        return static_type(e[1], param_types, funcs, stack)
    if k == "not":
        return T.BooleanType()
    if k == "bin":
        if e[1] in ("==", "!=", "<", "<=", ">", ">=", "and", "or"):
            return T.BooleanType()
        lt = static_type(e[2], param_types, funcs, stack)
        rt = static_type(e[3], param_types, funcs, stack)
        if isinstance(lt, T.DoubleType) or isinstance(rt, T.DoubleType):
            return T.DoubleType()
        return lt or rt
    if k == "call":
        name = e[1]
        if name in funcs and name not in stack:
            params, body = funcs[name]
            pts = {
                p: static_type(a, param_types, funcs, stack)
                for p, a in zip(params, e[2])
            }
            return static_type(body, pts, funcs, stack | {name})
        if name in ("len",):
            from pyspark.sql import types as T2

            return T2.LongType()
        return None
    return None
