"""The zq-style CLI (python -m zed_spark): query files, print ZSON."""

from __future__ import annotations

import subprocess
import sys


def _run(args: list[str], stdin: str | None = None) -> str:
    p = subprocess.run(
        [sys.executable, "-m", "zed_spark", *args],
        input=stdin,
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=180,
    )
    assert p.returncode == 0, p.stderr[-2000:]
    return p.stdout


def test_cli_query_file(tmp_path):
    f = tmp_path / "in.zson"
    f.write_text('{a:1,b:"x"}\n{a:5,b:"y"}\n{a:3,b:"x"}\n')
    out = _run(["where a > 1 | s:=sum(a) by b | sort b", str(f)])
    assert out.splitlines() == ['{b:"x",s:3}', '{b:"y",s:5}']


def test_cli_stdin_bare_values(tmp_path):
    out = _run(["yield n*10", "-"], stdin="{n:2}\n{n:3}\n")
    assert sorted(out.split()) == ["20", "30"]


def test_cli_json_output(tmp_path):
    f = tmp_path / "in.zson"
    f.write_text('{a:1,b:"x"}\n{a:5,b:"y"}\n')
    out = _run(["-f", "json", "head 1 | cut a", str(f)])
    assert out.strip() == '{"a":1}'
