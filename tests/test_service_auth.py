"""Auth gate on legacy HTTP routes.

The reference wraps every route except /auth/method in auth middleware
(service/core.go addAPIServerRoutes); the REST routes dispatched via
handle_api were already gated, these tests pin the legacy routes
(/pools, /status, /events, /pools/*/branches, branch ops, Accept-less
POST /query) and strict Bearer-scheme parsing (auth/validator.go)."""

import json
import urllib.error
import urllib.request

import pytest

from tests.conftest import SF_DIR
from zed_spark.auth import _b64url_encode, generate_access_token
from zed_spark.service import QueryService

AUD = "https://test.example.com"
DOMAIN = "https://testdomain.example.com"


def _rsa_fixture(tmp_path):
    from cryptography.hazmat.primitives import serialization
    from cryptography.hazmat.primitives.asymmetric import rsa

    key = rsa.generate_private_key(public_exponent=65537, key_size=2048)
    pem = key.private_bytes(
        serialization.Encoding.PEM,
        serialization.PrivateFormat.PKCS8,
        serialization.NoEncryption(),
    )
    pub = key.public_key().public_numbers()

    def b64int(x: int) -> str:
        return _b64url_encode(x.to_bytes((x.bit_length() + 7) // 8, "big"))

    jwks = {
        "keys": [
            {"kty": "RSA", "kid": "testkey", "n": b64int(pub.n), "e": b64int(pub.e)}
        ]
    }
    p = tmp_path / "jwks.json"
    p.write_text(json.dumps(jwks))
    return pem, str(p)


@pytest.fixture(scope="module")
def auth_svc(spark, tmp_path_factory):
    from zed_spark.sources.lake import Lake
    from zed_spark.sources.readers import read_table

    tmp = tmp_path_factory.mktemp("authsvc")
    pem, jwks_path = _rsa_fixture(tmp)
    root = str(tmp / "lake")
    lake = Lake(spark, root)
    lake.create_pool("events", key="ts").load(read_table(spark, SF_DIR, "events"))
    s = QueryService(
        spark,
        sf_dir=SF_DIR,
        lake_root=root,
        auth={
            "enabled": True,
            "audience": AUD,
            "clientid": "testclient",
            "domain": DOMAIN,
            "jwkspath": jwks_path,
        },
    )
    port = s.start()
    token = generate_access_token(
        "testkey", pem, 3600, AUD, DOMAIN, "tenant_a", "user_a"
    )
    yield f"http://127.0.0.1:{port}", token
    s.stop()


def _req(base, path, token=None, method="GET", body=None, scheme="Bearer"):
    req = urllib.request.Request(
        base + path,
        data=body.encode() if isinstance(body, str) else body,
        method=method,
    )
    if token:
        req.add_header("Authorization", f"{scheme} {token}")
    try:
        with urllib.request.urlopen(req, timeout=10) as resp:
            return resp.status, resp.read().decode()
    except urllib.error.HTTPError as e:
        return e.code, e.read().decode()


def test_auth_method_open(auth_svc):
    base, _ = auth_svc
    code, out = _req(base, "/auth/method")
    assert code == 200 and json.loads(out)["kind"] == "auth0"


@pytest.mark.parametrize(
    "path",
    ["/pools", "/status", "/events", "/pools/events/branches"],
)
def test_legacy_get_routes_require_token(auth_svc, path):
    base, _ = auth_svc
    code, out = _req(base, path)
    assert code == 401, (path, out)
    assert json.loads(out)["kind"] == "no credentials"


def test_legacy_get_routes_allow_valid_token(auth_svc):
    base, token = auth_svc
    code, out = _req(base, "/pools", token=token)
    assert code == 200, out
    code, _ = _req(base, "/status", token=token)
    assert code == 200


def test_branch_op_requires_token(auth_svc):
    base, token = auth_svc
    body = json.dumps({"name": "dev"})
    code, out = _req(base, "/pools/events/branch", method="POST", body=body)
    assert code == 401, out
    code, out = _req(
        base, "/pools/events/branch", token=token, method="POST", body=body
    )
    assert code == 200, out


def test_acceptless_query_requires_token(auth_svc):
    base, token = auth_svc
    code, out = _req(base, "/query", method="POST", body="from events | head 1")
    assert code == 401, out
    code, out = _req(
        base, "/query", token=token, method="POST", body="from events | head 1"
    )
    assert code == 200, out


def test_non_bearer_scheme_rejected(auth_svc):
    base, token = auth_svc
    code, out = _req(base, "/pools", token=token, scheme="Basic")
    assert code == 401, out
    # bare token (no scheme word) is also not credentials
    req = urllib.request.Request(base + "/pools")
    req.add_header("Authorization", token)
    try:
        with urllib.request.urlopen(req, timeout=10) as resp:
            code = resp.status
    except urllib.error.HTTPError as e:
        code = e.code
    assert code == 401
