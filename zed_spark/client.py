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
    frames ({"type": ..., "value": ...}); data frames carry inline
    type definitions that later frames reference by id."""
    types: dict = {}
    for msg in lines:
        typ, value = msg.get("type"), msg.get("value")
        if isinstance(typ, dict):
            yield _decode_value(_resolve_type(types, typ), value)
        elif typ == "QueryError":
            raise QueryError(value["error"])


def _resolve_type(types, typ):
    kind = typ["kind"]
    if kind == "ref":
        return types[typ["id"]]
    if kind == "record":
        for f in typ.get("fields") or []:
            f["type"] = _resolve_type(types, f["type"])
    elif kind in ("array", "set", "error", "named"):
        typ["type"] = _resolve_type(types, typ["type"])
    elif kind == "map":
        typ["key_type"] = _resolve_type(types, typ["key_type"])
        typ["val_type"] = _resolve_type(types, typ["val_type"])
    elif kind == "union":
        typ["types"] = [_resolve_type(types, t) for t in typ["types"]]
    elif kind not in ("primitive", "enum"):
        raise QueryError(f"unknown type kind {kind}")
    if "id" in typ:
        types[typ["id"]] = typ
    return typ


def _parse_go_duration(s: str) -> timedelta:
    from zed_spark.sources.zson import _parse_duration

    return timedelta(microseconds=_parse_duration(s) / 1000)


def _decode_value(typ, value):
    if value is None:
        return None
    kind = typ["kind"]
    if kind == "primitive":
        name = typ["name"]
        if name in (
            "uint8", "uint16", "uint32", "uint64",
            "int8", "int16", "int32", "int64",
        ):
            return int(value)
        if name == "duration":
            return _parse_go_duration(value)
        if name == "time":
            import dateutil.parser

            return dateutil.parser.isoparse(value)
        if name in ("float16", "float32", "float64"):
            return float(value)
        if name == "decimal":
            return decimal.Decimal(value)
        if name == "bool":
            return value == "true"
        if name == "bytes":
            return binascii.a2b_hex(value[2:])
        if name in ("string", "type"):
            return value
        if name == "ip":
            return ipaddress.ip_address(value)
        if name == "net":
            return ipaddress.ip_network(value)
        if name == "null":
            return None
        raise QueryError(f"unknown primitive name {name}")
    if kind == "record":
        return {
            f["name"]: _decode_value(f["type"], v)
            for f, v in zip(typ.get("fields") or [], value)
        }
    if kind == "array":
        return [_decode_value(typ["type"], v) for v in value]
    if kind == "set":
        return {_decode_value(typ["type"], v) for v in value}
    if kind == "map":
        kt, vt = typ["key_type"], typ["val_type"]
        return {
            _decode_value(kt, kv[0]): _decode_value(vt, kv[1])
            for kv in value
        }
    if kind == "union":
        tag, val = value
        return _decode_value(typ["types"][int(tag)], val)
    if kind == "enum":
        return typ["symbols"][int(value)]
    if kind in ("error", "named"):
        return _decode_value(typ["type"], value)
    raise QueryError(f"unknown type kind {kind}")
