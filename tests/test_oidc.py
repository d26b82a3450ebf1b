"""OIDC/JWT bearer validation (reference: oidc_auth_handler.cpp
semantics) — static JWKS fixtures, no network."""
import base64
import os

import pytest

from flapi_spark.oidc import (
    Jwks, OidcConfig, OidcValidator, TokenError, mint_jwt, rsa_verify_sha256,
)

# Deterministic RSA-2048 keypair, generated once for fixtures. The
# private exponent lives only in this test file; the validator sees
# public material (n, e) exactly as a JWKS document would carry it.
N = int(
    "0xa0e9705bb40113eb7f6dc55e2975e21867264bcb95555a36604c1b036a5a02a5"
    "4b1cac5fa102627439b66e691934fd3a5aa2a05e16b4f847dde938194ef930f2"
    "5a677c7caaa6fa301942a54a9098eb633eee7c5fc17dc464876a95f3df7acdc7"
    "a7e48fbcdf38c103d0820a596f61caee1f3232a8c0e66bd5bfc2ba728129a4b7"
    "1b7477fd17f7309f54feeb19508eca2ed00243a9a13032158bdbd609e3853007"
    "fe29841b14aee7cb13d902eea12fca89d8d275fde201fce3eaf4fa723d24aed0"
    "77fe7680869b74121f67ee65be0acdab1ad5c8cd34dfe7551d7b0ca907d23aec"
    "df2b1c0d977deea1923b4df6a8428e8bd47d8dfb5f9c8700e03d9b7928ca237d",
    16,
)
D = int(
    "0x3e491e0ce12869a586b5dee80bf46d8834a546418f94724f0a076b8d6ee55890"
    "d2fa4e5ed5dc2e6ffec6f7060793d3517b33e80f838a9970781d867185783fd2"
    "0fdc6efb72b31fb4ee9235991f4f920de0963fde70ef55cdf3fcf5fe684b08cc"
    "77d8a92adadd05198ce4494d4527fd7d1ee63765cb0566485ee9e971d93d5d5c"
    "437e005eeef3a54a938d6cf50c2db6bf0930066aaed52a6bf8fc1a48df48e525"
    "eb361e7e3b7d33f55e5d703308fb57bb50ad6f6b2429506ee12ee07d7c3f5fd0"
    "b788389b4e8647e78425d3ee370a5bc60935edfe3613154eef2c07dc23dfa873"
    "72b4ed8e5ae356860b4394cf02f8aaf170f0d9aea394b07923f76f62f2f55b01",
    16,
)
E = 65537
HS_SECRET = b"shared-secret-for-hs256-tests-32b"

ISSUER = "https://idp.example.test/realms/main"
AUD = "flapi-api"
NOW = 1_800_000_000


def _b64u(data: bytes) -> str:
    return base64.urlsafe_b64encode(data).decode().rstrip("=")


def _int_b64(v: int) -> str:
    return _b64u(v.to_bytes((v.bit_length() + 7) // 8, "big"))


JWKS = Jwks.from_dict(
    {
        "keys": [
            {"kty": "RSA", "kid": "rsa-1", "alg": "RS256",
             "n": _int_b64(N), "e": _int_b64(E)},
            {"kty": "oct", "kid": "hmac-1", "alg": "HS256",
             "k": _b64u(HS_SECRET)},
        ]
    }
)


def _claims(**over):
    base = {
        "sub": "user-42",
        "iss": ISSUER,
        "aud": AUD,
        "exp": NOW + 3600,
        "iat": NOW - 10,
        "preferred_username": "alice",
        "roles": ["read", "admin"],
        "groups": ["engineering"],
        "email": "alice@example.test",
    }
    base.update(over)
    return {k: v for k, v in base.items() if v is not None}


def _token(alg="RS256", kid="rsa-1", **over):
    return mint_jwt(
        _claims(**over), kid=kid, alg=alg,
        rsa_private=(N, D) if alg == "RS256" else None,
        hmac_key=HS_SECRET if alg == "HS256" else None,
    )


@pytest.fixture()
def validator():
    return OidcValidator(
        OidcConfig(issuer=ISSUER, allowed_audiences=[AUD]), JWKS
    )


def test_valid_rs256_token(validator):
    c = validator.validate(_token(), now=NOW)
    assert c.subject == "user-42"
    assert c.username == "alice"
    assert c.roles == ["read", "admin"]
    assert c.groups == ["engineering"]
    assert c.email == "alice@example.test"


def test_bearer_prefix_and_roles_helper(validator):
    assert validator.authenticate_bearer(
        "Bearer " + _token(), now=NOW
    ) == ["read", "admin"]


def test_valid_hs256_token(validator):
    c = validator.validate(_token(alg="HS256", kid="hmac-1"), now=NOW)
    assert c.username == "alice"


def test_expired_token_rejected(validator):
    tok = _token(exp=NOW - 5)
    with pytest.raises(TokenError, match="expired"):
        validator.validate(tok, now=NOW)
    # leeway admits it
    lax = OidcValidator(
        OidcConfig(issuer=ISSUER, allowed_audiences=[AUD], leeway_s=60), JWKS
    )
    assert lax.validate(tok, now=NOW).username == "alice"
    # verify_expiration=False skips the check (reference flag)
    off = OidcValidator(
        OidcConfig(issuer=ISSUER, allowed_audiences=[AUD],
                   verify_expiration=False), JWKS
    )
    assert off.validate(tok, now=NOW).username == "alice"


def test_wrong_issuer_rejected(validator):
    with pytest.raises(TokenError, match="issuer"):
        validator.validate(_token(iss="https://evil.example"), now=NOW)


def test_wrong_audience_rejected(validator):
    with pytest.raises(TokenError, match="audience"):
        validator.validate(_token(aud="other-api"), now=NOW)
    # list-valued aud intersecting the allow-list passes
    c = validator.validate(_token(aud=["other-api", AUD]), now=NOW)
    assert AUD in c.audience
    # empty allow-list = no audience restriction (reference semantics)
    open_v = OidcValidator(OidcConfig(issuer=ISSUER), JWKS)
    assert open_v.validate(_token(aud="whatever"), now=NOW)


def test_unknown_kid_rejected(validator):
    with pytest.raises(TokenError, match="kid"):
        validator.validate(_token(kid="rsa-rotated-away"), now=NOW)


def test_tampered_payload_rejected(validator):
    tok = _token()
    h, p, s = tok.split(".")
    import json as _json

    payload = _json.loads(base64.urlsafe_b64decode(p + "=" * (-len(p) % 4)))
    payload["roles"] = ["admin", "superuser"]
    forged = _b64u(_json.dumps(payload).encode())
    with pytest.raises(TokenError, match="signature"):
        validator.validate(f"{h}.{forged}.{s}", now=NOW)


def test_alg_confusion_rejected(validator):
    """A token HMAC-signed but claiming the RSA kid must fail: the key's
    declared alg pins the verification path (classic RS256->HS256
    downgrade)."""
    tok = mint_jwt(_claims(), kid="rsa-1", alg="HS256", hmac_key=HS_SECRET)
    with pytest.raises(TokenError):
        validator.validate(tok, now=NOW)


def test_missing_sub_and_none_alg_rejected(validator):
    with pytest.raises(TokenError, match="sub"):
        validator.validate(_token(sub=None), now=NOW)
    h = _b64u(b'{"alg":"none","kid":"rsa-1"}')
    p = _b64u(b'{"sub":"x","iss":"%s"}' % ISSUER.encode())
    with pytest.raises(TokenError, match="alg"):
        validator.validate(f"{h}.{p}.", now=NOW)


def test_nbf_honored(validator):
    with pytest.raises(TokenError, match="nbf"):
        validator.validate(_token(nbf=NOW + 300), now=NOW)


def test_nested_roles_claim_path():
    """Keycloak-style realm_access.roles nested path (the reference's
    role_claim_path supports the same dotted syntax)."""
    v = OidcValidator(
        OidcConfig(issuer=ISSUER, roles_claim="realm_access.roles"), JWKS
    )
    tok = _token(roles=None, realm_access={"roles": ["analyst"]})
    assert v.validate(tok, now=NOW).roles == ["analyst"]


def test_rsa_verify_rejects_wrong_length():
    assert not rsa_verify_sha256(b"msg", b"short", N, E)


def test_oidc_roles_feed_mcp_rbac(spark, validator):
    """End-to-end: bearer token roles drive fail-closed MCP RBAC."""
    from flapi_spark.config import EndpointConfig
    from flapi_spark.executor import QueryExecutor
    from flapi_spark.mcp import AuthorizationError, McpRegistry
    from flapi_spark.sources.registry import Connection, ConnectionRegistry

    sf = os.environ.get("FLAPI_SPARK_TEST_SF", "/root/testdata/sf0.001")
    reg = ConnectionRegistry()
    reg.add(Connection(name="customers-parquet",
                       properties={"path": os.path.join(sf, "customer.parquet")}))
    mcp = McpRegistry(QueryExecutor(spark, reg), auth_enabled=True)
    ep = EndpointConfig(
        url_path="/customers/",
        template_text="SELECT c_custkey AS key FROM parquet.`{{{conn.path}}}`",
        connections=["customers-parquet"],
        with_pagination=False,
    )
    mcp.register("lookup", ep, allowed_roles=["admin"])

    roles = validator.authenticate_bearer("Bearer " + _token(), now=NOW)
    assert mcp.call_tool("lookup", {}, roles=roles)["row_count"] > 0

    weak = validator.authenticate_bearer(
        "Bearer " + _token(roles=["viewer"]), now=NOW
    )
    with pytest.raises(AuthorizationError):
        mcp.call_tool("lookup", {}, roles=weak)

    with pytest.raises(TokenError):
        validator.authenticate_bearer("Bearer " + _token(exp=NOW - 1), now=NOW)
