"""OIDC / JWT bearer-token validation feeding role-based access control.

Re-expresses the reference's OIDC handler semantics (reference:
src/oidc_auth_handler.cpp:14-200, oidc_jwks_manager.cpp,
auth_middleware.cpp) as a dependency-free validator:

- JWT header must carry ``kid`` and ``alg``; the key is looked up in a
  JWKS document (static dict here — the reference fetches the same
  JSON from the provider's jwks_uri; transport is out of scope).
- Signature verified before any claim is trusted. RS256 is implemented
  with stdlib integer math (``pow(sig, e, n)`` + EMSA-PKCS1-v1_5
  compare — constant public-key operations, no private material);
  HS256 via ``hmac``.
- ``sub`` and ``iss`` are required; ``iss`` must equal the configured
  issuer exactly.
- Audience: token ``aud`` (string or list) must intersect the
  configured allowed audiences; an empty allow-list means no audience
  restriction (reference: validateAudience).
- ``exp`` enforced when ``verify_expiration`` (with leeway); ``nbf``
  honored when present.
- Username from a configurable claim (fallback ``sub``); roles from a
  configurable, possibly nested claim path (e.g.
  ``realm_access.roles`` — reference supports the same dotted path);
  groups likewise.

The resulting roles feed the same RBAC surface as basic auth
(flapi_spark/auth.py → McpRegistry / endpoint ``auth:`` blocks).
"""

from __future__ import annotations

import base64
import hashlib
import hmac
import json
import time as _time
from dataclasses import dataclass, field
from typing import Any

from flapi_spark.auth import AuthError


class TokenError(AuthError):
    """Bearer token failed validation."""


def _b64url_decode(text: str) -> bytes:
    pad = "=" * (-len(text) % 4)
    return base64.urlsafe_b64decode(text + pad)


def _b64url_encode(data: bytes) -> str:
    return base64.urlsafe_b64encode(data).decode().rstrip("=")


# ASN.1 DigestInfo prefix for SHA-256 (RFC 8017 §9.2 notes)
_SHA256_DIGEST_INFO = bytes.fromhex("3031300d060960864801650304020105000420")


def _emsa_pkcs1_v15_sha256(message: bytes, k: int) -> bytes:
    digest_info = _SHA256_DIGEST_INFO + hashlib.sha256(message).digest()
    ps_len = k - len(digest_info) - 3
    if ps_len < 8:
        raise TokenError("RSA modulus too small for SHA-256 signature")
    return b"\x00\x01" + b"\xff" * ps_len + b"\x00" + digest_info


def rsa_verify_sha256(message: bytes, signature: bytes, n: int, e: int) -> bool:
    """RSASSA-PKCS1-v1_5 / SHA-256 verification with stdlib integers."""
    k = (n.bit_length() + 7) // 8
    if len(signature) != k:
        return False
    m = pow(int.from_bytes(signature, "big"), e, n)
    try:
        expected = _emsa_pkcs1_v15_sha256(message, k)
    except TokenError:
        return False
    return hmac.compare_digest(m.to_bytes(k, "big"), expected)


@dataclass
class Jwk:
    """One JWKS key. RSA keys carry (n, e); symmetric keys carry k."""

    kid: str
    kty: str
    n: int | None = None
    e: int | None = None
    k: bytes | None = None
    alg: str | None = None

    @classmethod
    def from_dict(cls, d: dict) -> "Jwk":
        kty = d.get("kty", "")
        jwk = cls(kid=str(d.get("kid", "")), kty=kty, alg=d.get("alg"))
        if kty == "RSA":
            jwk.n = int.from_bytes(_b64url_decode(d["n"]), "big")
            jwk.e = int.from_bytes(_b64url_decode(d["e"]), "big")
        elif kty == "oct":
            jwk.k = _b64url_decode(d["k"])
        return jwk


class Jwks:
    """Static JWKS document: ``{"keys": [...]}`` keyed by kid
    (reference: oidc_jwks_manager.cpp caches the same structure)."""

    def __init__(self, keys: list[Jwk]):
        self._keys = {k.kid: k for k in keys if k.kid}

    @classmethod
    def from_dict(cls, doc: dict) -> "Jwks":
        return cls([Jwk.from_dict(d) for d in doc.get("keys", [])])

    def get(self, kid: str) -> Jwk | None:
        return self._keys.get(kid)


def _claim_path(payload: dict, path: str) -> Any:
    """Resolve a possibly-dotted claim path (``realm_access.roles``)."""
    cur: Any = payload
    for part in path.split("."):
        if isinstance(cur, dict) and part in cur:
            cur = cur[part]
        else:
            return None
    return cur


def _as_list(value: Any) -> list[str]:
    if value is None:
        return []
    if isinstance(value, str):
        return [value]
    if isinstance(value, list):
        return [str(v) for v in value]
    return [str(value)]


@dataclass
class TokenClaims:
    subject: str
    username: str
    issuer: str
    audience: list[str] = field(default_factory=list)
    roles: list[str] = field(default_factory=list)
    groups: list[str] = field(default_factory=list)
    email: str | None = None
    expires_at: int | None = None
    issued_at: int | None = None
    jti: str | None = None
    raw: dict = field(default_factory=dict)


@dataclass
class OidcConfig:
    """Validator configuration (reference: OIDCAuthHandler::Config)."""

    issuer: str
    allowed_audiences: list[str] = field(default_factory=list)
    username_claim: str = "preferred_username"
    email_claim: str = "email"
    roles_claim: str = "roles"
    groups_claim: str = "groups"
    verify_expiration: bool = True
    leeway_s: int = 0


_SUPPORTED_ALGS = ("RS256", "HS256")


class OidcValidator:
    def __init__(self, config: OidcConfig, jwks: Jwks):
        self.config = config
        self.jwks = jwks

    def validate(self, token: str, now: int | None = None) -> TokenClaims:
        """Validate a compact JWT and return its claims, or raise
        TokenError. `now` is epoch seconds (tests pin it)."""
        if token.startswith("Bearer "):
            token = token[len("Bearer "):]
        now = int(_time.time()) if now is None else now

        parts = token.split(".")
        if len(parts) != 3:
            raise TokenError("malformed JWT (expected 3 segments)")
        try:
            header = json.loads(_b64url_decode(parts[0]))
            payload = json.loads(_b64url_decode(parts[1]))
            signature = _b64url_decode(parts[2])
        except (ValueError, TypeError) as exc:
            raise TokenError(f"undecodable JWT: {exc}") from exc

        alg = header.get("alg")
        if alg not in _SUPPORTED_ALGS:
            raise TokenError(f"unsupported or missing alg {alg!r}")
        kid = header.get("kid")
        if not kid:
            raise TokenError("JWT header missing 'kid'")
        key = self.jwks.get(kid)
        if key is None:
            raise TokenError(f"unknown kid {kid!r} (not in JWKS)")
        if key.alg and key.alg != alg:
            raise TokenError(f"alg {alg!r} does not match key alg {key.alg!r}")

        signing_input = f"{parts[0]}.{parts[1]}".encode()
        if alg == "RS256":
            if key.kty != "RSA" or key.n is None or key.e is None:
                raise TokenError("RS256 token but key is not RSA")
            ok = rsa_verify_sha256(signing_input, signature, key.n, key.e)
        else:  # HS256
            if key.kty != "oct" or key.k is None:
                raise TokenError("HS256 token but key is not symmetric")
            ok = hmac.compare_digest(
                hmac.new(key.k, signing_input, hashlib.sha256).digest(), signature
            )
        if not ok:
            raise TokenError("signature verification failed")

        sub = payload.get("sub")
        if not sub:
            raise TokenError("token missing 'sub' claim")
        iss = payload.get("iss")
        if not iss:
            raise TokenError("token missing 'iss' claim")
        if iss != self.config.issuer:
            raise TokenError(
                f"issuer mismatch: {iss!r} != {self.config.issuer!r}"
            )

        audience = _as_list(payload.get("aud"))
        if self.config.allowed_audiences and not (
            set(audience) & set(self.config.allowed_audiences)
        ):
            raise TokenError(f"audience {audience!r} not allowed")

        exp = payload.get("exp")
        if self.config.verify_expiration and exp is not None:
            if now >= int(exp) + self.config.leeway_s:
                raise TokenError("token has expired")
        nbf = payload.get("nbf")
        if nbf is not None and now < int(nbf) - self.config.leeway_s:
            raise TokenError("token not yet valid (nbf)")

        username = payload.get(self.config.username_claim) or sub
        return TokenClaims(
            subject=str(sub),
            username=str(username),
            issuer=str(iss),
            audience=audience,
            roles=_as_list(_claim_path(payload, self.config.roles_claim)),
            groups=_as_list(_claim_path(payload, self.config.groups_claim)),
            email=payload.get(self.config.email_claim),
            expires_at=int(exp) if exp is not None else None,
            issued_at=int(payload["iat"]) if "iat" in payload else None,
            jti=payload.get("jti"),
            raw=payload,
        )

    def authenticate_bearer(self, header_value: str, now: int | None = None) -> list[str]:
        """Validate an Authorization header value and return the roles
        for RBAC — the bearer-token twin of
        BasicAuthenticator.authenticate."""
        return self.validate(header_value, now=now).roles


# --- token minting (tests / dev fixtures only) -----------------------------


def mint_jwt(
    payload: dict,
    kid: str,
    alg: str = "RS256",
    rsa_private: tuple[int, int] | None = None,  # (n, d)
    hmac_key: bytes | None = None,
) -> str:
    """Produce a signed compact JWT. Test/dev helper — a production
    deployment receives tokens from the identity provider, never mints
    them (reference mints nothing either; its tests use fixtures)."""
    header = {"alg": alg, "typ": "JWT", "kid": kid}
    h = _b64url_encode(json.dumps(header, separators=(",", ":")).encode())
    p = _b64url_encode(json.dumps(payload, separators=(",", ":")).encode())
    signing_input = f"{h}.{p}".encode()
    if alg == "RS256":
        if rsa_private is None:
            raise ValueError("RS256 minting needs (n, d)")
        n, d = rsa_private
        k = (n.bit_length() + 7) // 8
        em = int.from_bytes(_emsa_pkcs1_v15_sha256(signing_input, k), "big")
        sig = pow(em, d, n).to_bytes(k, "big")
    elif alg == "HS256":
        if hmac_key is None:
            raise ValueError("HS256 minting needs hmac_key")
        sig = hmac.new(hmac_key, signing_input, hashlib.sha256).digest()
    else:
        raise ValueError(f"unsupported alg {alg}")
    return f"{h}.{p}.{_b64url_encode(sig)}"
