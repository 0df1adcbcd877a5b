"""Python client for the lake service — the `superdb` package surface.

Mirrors the reference's Python client API (python/superdb/superdb.py:
Client / RequestError / QueryError and the ZJSON value decoding
documented in docs/formats/zjson.md), implemented against this repo's
service.  Query results decode to native Python values: records →
dict, arrays → list, sets → set, maps → dict, unions → the active
member, enums → the symbol, time → tz-aware datetime, duration →
timedelta, ip/net → ipaddress objects, bytes → bytes.
"""

from __future__ import annotations

import binascii
import decimal
import getpass
import ipaddress
import json
import os
import urllib.parse
from datetime import timedelta


class RequestError(Exception):
    """Raised by Client methods when an HTTP request fails."""

    def __init__(self, message, response=None):
        super().__init__(message)
        self.response = response


class QueryError(Exception):
    """Raised by Client.query() when a query fails mid-stream."""


class Client:
    def __init__(
        self,
        base_url=None,
        config_dir=None,
    ):
        import requests

        if base_url is None:
            base_url = os.environ.get(
                "SUPER_DB_LAKE", "http://localhost:9867"
            )
        if config_dir is None:
            config_dir = os.path.expanduser("~/.zed")
        self.base_url = base_url.rstrip("/")
        self.session = requests.Session()
        self.session.headers.update({"Accept": "application/x-zjson"})
        token = self._auth_token(config_dir)
        if token is not None:
            self.session.headers.update(
                {"Authorization": "Bearer " + token}
            )

    def _auth_token(self, config_dir):
        """Stored credentials, keyed by service URL
        (`super db auth store` writes credentials.json)."""
        try:
            with open(os.path.join(config_dir, "credentials.json")) as f:
                creds = json.load(f)
        except (FileNotFoundError, NotADirectoryError):
            return None
        svc = creds.get("services", {}).get(self.base_url)
        return svc.get("access") if svc else None

    def create_pool(
        self, name, layout={"order": "desc", "keys": [["ts"]]}, thresh=0
    ):
        r = self.session.post(
            self.base_url + "/pool",
            json={"name": name, "layout": layout, "thresh": thresh},
        )
        self._check(r)

    def load(
        self,
        pool_name_or_id,
        data,
        branch_name="main",
        commit_author=None,
        commit_body="",
    ):
        if commit_author is None:
            try:
                commit_author = getpass.getuser()
            except Exception:
                commit_author = ""
        pool = urllib.parse.quote(pool_name_or_id, safe="")
        branch = urllib.parse.quote(branch_name, safe="")
        r = self.session.post(
            f"{self.base_url}/pool/{pool}/branch/{branch}",
            headers={
                "Zed-Commit": json.dumps(
                    {"author": commit_author, "body": commit_body}
                )
            },
            data=data,
        )
        self._check(r)

    def query(self, query):
        r = self.query_raw(query)
        zjson = (json.loads(ln) for ln in r.iter_lines() if ln)
        return decode_zjson(zjson)

    def query_raw(self, query, headers=None):
        r = self.session.post(
            self.base_url + "/query",
            headers=headers,
            json={"query": query},
            stream=True,
        )
        self._check(r)
        return r

    def auth_identity(self):
        r = self.session.get(self.base_url + "/auth/identity")
        self._check(r)
        return r.json()

    def auth_method(self):
        r = self.session.get(self.base_url + "/auth/method")
        self._check(r)
        return r.json()

    @staticmethod
    def _check(response):
        if response.status_code >= 400:
            try:
                error = response.json()["error"]
            except Exception:
                response.raise_for_status()
            else:
                raise RequestError(error, response)


def decode_zjson(lines):
    """Generator over decoded values from an iterable of parsed ZJSON
    frames ({"type": ..., "value": ...}).

    Type resolution rides the repo's own ZJSON machinery
    (sources/zjson.py registry model: defs collected per frame,
    refs resolved lazily at each node) — only the native-Python
    coercions live here. The Client API surface itself mirrors the
    reference's public BSD-3-licensed Python client
    (python/superdb/superdb.py) because the service ztests exec
    scripts against exactly that surface."""
    from zed_spark.sources.zjson import _collect_defs

    registry: dict = {}
    for msg in lines:
        typ, value = msg.get("type"), msg.get("value")
        if isinstance(typ, dict):
            _collect_defs(typ, registry)
            yield _to_native(value, typ, registry)
        elif typ == "QueryError":
            raise QueryError(value["error"])


def _parse_go_duration(s: str) -> timedelta:
    from zed_spark.sources.zson import _parse_duration

    return timedelta(microseconds=_parse_duration(s) / 1000)


def _parse_iso_time(s: str):
    import dateutil.parser

    return dateutil.parser.isoparse(s)


# primitive name -> native coercion (zjson.md "Primitive Values")
_PRIM_NATIVE = {
    **{n: int for n in (
        "uint8", "uint16", "uint32", "uint64",
        "int8", "int16", "int32", "int64",
    )},
    **{n: float for n in ("float16", "float32", "float64")},
    "duration": _parse_go_duration,
    "time": _parse_iso_time,
    "decimal": decimal.Decimal,
    "bool": lambda s: s == "true",
    "bytes": lambda s: binascii.a2b_hex(s[2:]),
    "string": lambda s: s,
    "type": lambda s: s,
    "ip": ipaddress.ip_address,
    "net": ipaddress.ip_network,
    "null": lambda s: None,
}


def _to_native(value, typ: dict, registry: dict):
    """ZJSON value -> native Python, per the kind of its (possibly
    ref-indirected) type node."""
    from zed_spark.sources.zjson import _resolve_type

    typ = _resolve_type(typ, registry)
    if value is None:
        return None
    kind = typ.get("kind")
    if kind == "primitive":
        try:
            fn = _PRIM_NATIVE[typ["name"]]
        except KeyError:
            raise QueryError(f"unknown primitive name {typ['name']}") from None
        return fn(value)
    if kind in ("named", "error"):
        return _to_native(value, typ["type"], registry)
    if kind == "record":
        return {
            f["name"]: _to_native(v, f["type"], registry)
            for f, v in zip(typ.get("fields") or [], value)
        }
    if kind == "array":
        return [_to_native(v, typ["type"], registry) for v in value]
    if kind == "set":
        return {_to_native(v, typ["type"], registry) for v in value}
    if kind == "map":
        return {
            _to_native(k, typ["key_type"], registry): _to_native(
                v, typ["val_type"], registry
            )
            for k, v in value
        }
    if kind == "union":
        tag, inner = value
        return _to_native(inner, typ["types"][int(tag)], registry)
    if kind == "enum":
        return typ["symbols"][int(value)]
    raise QueryError(f"unknown type kind {kind}")
