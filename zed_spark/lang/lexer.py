"""Tokenizer for the zed-language subset.

Token kinds: NUM, STR, ID, DUR (duration literal like 5m/1h), TIME
(ISO date/time literal), OP (punctuation/operators), EOF.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

_TOKEN_RE = re.compile(
    r"""
    (?P<WS>\s+)
  | (?P<TIME>\d{4}-\d{2}-\d{2}(?:T\d{2}:\d{2}:\d{2}(?:\.\d+)?Z?)?)
  | (?P<IP>\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}(?:/\d{1,2})?
     |(?=[0-9A-Fa-f:]*::)[0-9A-Fa-f]{0,4}(?::[0-9A-Fa-f]{0,4})+(?:/\d{1,3})?)
  | (?P<DUR>(?:\d+(?:\.\d+)?(?:ns|us|ms|s|m|h|d|w|y))+)
  | (?P<NUM>\d+\.\d+|\.\d+|\d+)
  | (?P<FSTR>f"(?:\\.|[^"\\])*"|f'(?:\\.|[^'\\])*')
  | (?P<STR>"(?:\\.|[^"\\])*"|'(?:\\.|[^'\\])*')
  | (?P<BSTR>(?:[A-Za-z0-9_.*]|\\[^\s])*\\[^\s](?:[A-Za-z0-9_.*]|\\[^\s])*)
  | (?P<ID>[A-Za-z_][A-Za-z_0-9]*)
  | (?P<OP>:=|==|!=|<=|>=|=~|!~|=>|\|>|\||\.\.\.|[-+*/%(),.\[\]{}:?<>=!@~])
    """,
    re.VERBOSE,
)

# a regexp literal /.../ is only lexed immediately after a match
# operator (~ / !~) — elsewhere '/' is division (parser.peg lexes
# regexps the same contextual way)
_REGEX_RE = re.compile(r"/(?:\\.|[^/\\])*/")
_WS_RE = re.compile(r"\s*")


@dataclass
class Token:
    kind: str
    text: str
    pos: int

    def __repr__(self) -> str:
        return f"{self.kind}({self.text!r})"


def tokenize(src: str) -> list[Token]:
    out: list[Token] = []
    pos = 0
    while pos < len(src):
        if src.startswith("//", pos):
            # line comment (parser.peg comments)
            nl = src.find("\n", pos)
            pos = len(src) if nl < 0 else nl + 1
            continue
        if src[pos] == "/" and (
            not out
            or out[-1].text
            in ("|", "not", "!", "and", "or", "(", "==", "!=", ",")
        ):
            # a regexp literal may open a query, follow a pipe, a
            # search connective (`not /^APPL/`), or sit in argument
            # position (`grep(/foo|baz/)`, `regexp_replace(s, /re/,
            # t)` — docs/language/functions/regexp*.md); after any of
            # these a '/' cannot be division (no left operand)
            rm = _REGEX_RE.match(src, pos)
            if rm:
                out.append(Token("REGEX", rm.group(), pos))
                pos = rm.end()
                continue
        if src.startswith(('f"', "f'"), pos):
            # f-strings scan manually: replacements may hold nested
            # quotes and nested f-strings (expressions.md
            # `f"oh {this[upper(f"{foo + bar}")]}"`), which a single
            # regex can't pair
            quote = src[pos + 1]
            i = pos + 2
            depth = 0
            end = None
            while i < len(src):
                ch = src[i]
                if ch == "\\":
                    i += 2
                    continue
                if ch == "{":
                    depth += 1
                elif ch == "}":
                    depth = max(0, depth - 1)
                elif ch == quote and depth == 0:
                    end = i
                    break
                elif depth > 0 and ch in "\"'":
                    if src[i - 1] == "f":
                        # nested f-string: track ITS braces in the
                        # same depth counter; its quote closes at
                        # depth back to the current level — simple
                        # approach: skip to the matching quote
                        # honoring braces recursively
                        d2 = 0
                        j = i + 1
                        while j < len(src):
                            c2 = src[j]
                            if c2 == "\\":
                                j += 2
                                continue
                            if c2 == "{":
                                d2 += 1
                            elif c2 == "}":
                                d2 = max(0, d2 - 1)
                            elif c2 == ch and d2 == 0:
                                break
                            j += 1
                        i = j
                    else:
                        q2 = ch
                        j = i + 1
                        while j < len(src) and src[j] != q2:
                            if src[j] == "\\":
                                j += 1
                            j += 1
                        i = j
                i += 1
            if end is not None:
                out.append(Token("FSTR", src[pos : end + 1], pos))
                pos = end + 1
                continue
        m = _TOKEN_RE.match(src, pos)
        if not m:
            raise SyntaxError(f"unexpected character {src[pos]!r} at {pos}: {src[max(0,pos-20):pos+5]!r}")
        kind = m.lastgroup
        if kind != "WS":
            out.append(Token(kind, m.group(), pos))
        pos = m.end()
        if kind == "OP" and m.group() in ("~", "!~"):
            pos = _WS_RE.match(src, pos).end()
            rm = _REGEX_RE.match(src, pos)
            if rm:
                out.append(Token("REGEX", rm.group(), pos))
                pos = rm.end()
    out.append(Token("EOF", "", pos))
    return out


_DUR_NS = {
    "ns": 1,
    "us": 1_000,
    "ms": 1_000_000,
    "s": 1_000_000_000,
    "m": 60 * 1_000_000_000,
    "h": 3_600 * 1_000_000_000,
    "d": 86_400 * 1_000_000_000,
    "w": 7 * 86_400 * 1_000_000_000,
    "y": 365 * 86_400 * 1_000_000_000,
}


_DUR_PART = re.compile(r"(\d+(?:\.\d+)?)(ns|us|ms|s|m|h|d|w|y)")


def duration_ns(text: str) -> int:
    """zed duration literal → int64 ns. Durations compound units
    ('2h2s', nano.ParseDuration): each part sums."""
    parts = _DUR_PART.findall(text)
    if not parts or "".join(n + u for n, u in parts) != text:
        raise SyntaxError(f"bad duration {text!r}")
    return sum(int(float(n) * _DUR_NS[u]) for n, u in parts)


def duration_interval(text: str) -> str:
    """zed duration literal → Spark interval string ('5m' →
    '5 minutes'; compound '2h2s' → '2 hours 2 seconds')."""
    parts = _DUR_PART.findall(text)
    if not parts or "".join(n + u for n, u in parts) != text:
        raise SyntaxError(f"bad duration {text!r}")
    names = {
        "us": "microseconds", "ms": "milliseconds", "s": "seconds",
        "m": "minutes", "h": "hours", "d": "days", "w": "weeks",
    }
    out = []
    for n, unit in parts:
        if unit == "ns":
            out.append(f"{max(1, int(float(n)) // 1000)} microseconds")
        elif unit == "y":
            out.append(f"{int(float(n)) * 365} days")
        else:
            out.append(f"{n} {names[unit]}")
    return " ".join(out)
