"""Service authentication: JWT (RS256) validation and generation.

Mirrors the reference's auth layer (service/auth.go NewAuthenticator;
service/auth/validator.go TokenValidator; service/auth/generator.go
GenerateAccessToken; cmd/gentoken/main.go) over the stdlib +
`cryptography` instead of golang-jwt: an access token is an RS256 JWT
whose key id resolves in a JSON Web Key Set file, with required
audience / expiration / issuer claims and optional namespaced tenant
and user id claims.  The issuer is always the Auth0 domain URL with a
trailing "/" (validator.go:41).
"""

from __future__ import annotations

import base64
import json
import time
from dataclasses import dataclass

# Namespaced custom claims expected on any JWT access token
# (service/auth/validator.go:17-22).
TENANT_ID_CLAIM = "https://lake.brimdata.io/tenant_id"
USER_ID_CLAIM = "https://lake.brimdata.io/user_id"

# service/auth/auth.go:11-14
ANONYMOUS_TENANT_ID = "tenant_000000000000000000000000001"
ANONYMOUS_USER_ID = "user_000000000000000000000000001"


class AuthError(Exception):
    """A credentials failure — rendered as HTTP 401 (srverr
    NoCredentials kind; the Go client prints it as
    `status code 401: <message>`)."""

    code = 401
    kind = "no credentials"

    def __init__(self, message: str = "no token present in request"):
        super().__init__(message)


@dataclass
class Identity:
    tenant_id: str = ANONYMOUS_TENANT_ID
    user_id: str = ANONYMOUS_USER_ID


def _b64url_decode(s: str) -> bytes:
    return base64.urlsafe_b64decode(s + "=" * (-len(s) % 4))


def _b64url_encode(b: bytes) -> str:
    return base64.urlsafe_b64encode(b).decode().rstrip("=")


def load_public_keys(jwks: dict) -> dict:
    """kid → RSA public key from a JSON Web Key Set.  Like the
    reference (validator.go loadPublicKeys), keys are taken from the
    first x5c certificate; n/e modulus form is accepted too."""
    from cryptography import x509
    from cryptography.hazmat.primitives.asymmetric.rsa import (
        RSAPublicNumbers,
    )

    keys = {}
    for jwk in jwks.get("keys", []):
        kid = jwk.get("kid")
        if jwk.get("x5c"):
            der = base64.b64decode(jwk["x5c"][0])
            cert = x509.load_der_x509_certificate(der)
            keys[kid] = cert.public_key()
        elif jwk.get("n") and jwk.get("e"):
            n = int.from_bytes(_b64url_decode(jwk["n"]), "big")
            e = int.from_bytes(_b64url_decode(jwk["e"]), "big")
            keys[kid] = RSAPublicNumbers(e, n).public_key()
    return keys


class TokenValidator:
    """Validates RS256 access tokens (service/auth/validator.go).

    `jwks` may be a parsed JWKS dict or a path to one on disk."""

    def __init__(self, audience: str, domain: str, jwks):
        if isinstance(jwks, str):
            with open(jwks) as f:
                jwks = json.load(f)
        self.expected_audience = audience
        # Auth0 issuer is always the domain URL + "/" (validator.go:41)
        self.expected_issuer = domain + "/"
        self.keys = load_public_keys(jwks)

    def validate_request(self, headers: dict) -> Identity:
        """Extract + validate the Authorization header of one request
        (validator.go ValidateRequest)."""
        authz = None
        for k, v in (headers or {}).items():
            if k.lower() == "authorization":
                authz = v
                break
        if not authz:
            raise AuthError("no token present in request")
        # Only the "Bearer <token>" form carries credentials; any
        # other scheme (Basic, bare token) is a no-credentials error,
        # matching the reference's bearer-token extractor.
        parts = authz.split()
        if len(parts) != 2 or parts[0].lower() != "bearer":
            raise AuthError("no token present in request")
        return self.validate(parts[1])

    def validate(self, token: str) -> Identity:
        from cryptography.exceptions import InvalidSignature
        from cryptography.hazmat.primitives.asymmetric import padding
        from cryptography.hazmat.primitives.hashes import SHA256

        if not token:
            raise AuthError("no token present in request")
        try:
            h64, p64, s64 = token.split(".")
            header = json.loads(_b64url_decode(h64))
            claims = json.loads(_b64url_decode(p64))
            sig = _b64url_decode(s64)
        except Exception:
            raise AuthError("invalid token") from None
        key = self.keys.get(header.get("kid"))
        if key is None:
            raise AuthError("invalid token")  # unknown token key id
        if header.get("alg") != "RS256":
            raise AuthError("invalid signing method")
        try:
            key.verify(
                sig, f"{h64}.{p64}".encode(), padding.PKCS1v15(), SHA256()
            )
        except InvalidSignature:
            raise AuthError("invalid token") from None
        # audience: required, exact (validator.go VerifyAudience req=true)
        aud = claims.get("aud")
        auds = aud if isinstance(aud, list) else [aud]
        if self.expected_audience not in auds:
            raise AuthError("invalid audience")
        # expiry: must be present AND unexpired (validator.go:86-91)
        exp = claims.get("exp")
        if not isinstance(exp, (int, float)) or exp < time.time():
            raise AuthError("invalid expiration")
        if claims.get("iss") != self.expected_issuer:
            raise AuthError("invalid issuer")
        ident = Identity()
        if TENANT_ID_CLAIM in claims:
            s = claims[TENANT_ID_CLAIM]
            if not isinstance(s, str) or not s or s == ANONYMOUS_TENANT_ID:
                raise AuthError("invalid tenant ID")
            ident.tenant_id = s
        if USER_ID_CLAIM in claims:
            s = claims[USER_ID_CLAIM]
            # the reference reuses the tenant wording here
            # (validator.go:105)
            if not isinstance(s, str) or not s or s == ANONYMOUS_USER_ID:
                raise AuthError("invalid tenant ID")
            ident.user_id = s
        return ident


def generate_access_token(
    key_id: str,
    private_key_pem: bytes | str,
    expiration_secs: float,
    audience: str,
    domain: str,
    tenant_id: str,
    user_id: str,
) -> str:
    """RS256 JWT with the claims the service checks
    (service/auth/generator.go GenerateAccessToken; the `gentoken`
    test helper defaults expiration to 4h, cmd/gentoken/main.go:37)."""
    from cryptography.hazmat.primitives.asymmetric import padding
    from cryptography.hazmat.primitives.hashes import SHA256
    from cryptography.hazmat.primitives.serialization import (
        load_pem_private_key,
    )

    if isinstance(private_key_pem, str):
        private_key_pem = private_key_pem.encode()
    key = load_pem_private_key(private_key_pem, password=None)
    header = {"alg": "RS256", "typ": "JWT", "kid": key_id}
    claims = {
        "aud": audience,
        "exp": int(time.time() + expiration_secs),
        "iss": domain + "/",
        TENANT_ID_CLAIM: tenant_id,
        USER_ID_CLAIM: user_id,
    }
    signing = (
        _b64url_encode(json.dumps(header, separators=(",", ":")).encode())
        + "."
        + _b64url_encode(json.dumps(claims, separators=(",", ":")).encode())
    )
    sig = key.sign(signing.encode(), padding.PKCS1v15(), SHA256())
    return signing + "." + _b64url_encode(sig)
