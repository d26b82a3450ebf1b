"""Password hashing + basic-auth semantics (reference:
password_hasher_test.cpp, auth_middleware_test.cpp)."""

import pytest

from flapi_spark.auth import (
    AuthError, BasicAuthenticator, hash_password, verify_password,
)


def test_hash_verify_roundtrip():
    h = hash_password("s3cret")
    assert h.startswith("$pbkdf2-sha256$")
    assert verify_password("s3cret", h)


def test_wrong_password_rejected():
    assert not verify_password("wrong", hash_password("right"))


def test_same_password_different_salts():
    assert hash_password("x") != hash_password("x")
    assert verify_password("x", hash_password("x"))


def test_malformed_hash_rejected():
    assert not verify_password("x", "$pbkdf2-sha256$garbage")


def test_plaintext_fallback():
    assert verify_password("devpass", "devpass")
    assert not verify_password("devpass", "other")


AUTH_BLOCK = {
    "enabled": True,
    "type": "basic",
    "users": [
        {"username": "admin", "password": "secret", "roles": ["admin", "read"]},
        {"username": "bot", "password": hash_password("botpw"), "roles": ["ai_tools"]},
    ],
}


def test_authenticate_resolves_roles():
    auth = BasicAuthenticator(AUTH_BLOCK)
    assert auth.authenticate("admin", "secret") == ["admin", "read"]
    assert auth.authenticate("bot", "botpw") == ["ai_tools"]


def test_authenticate_rejects_bad_creds():
    auth = BasicAuthenticator(AUTH_BLOCK)
    with pytest.raises(AuthError):
        auth.authenticate("admin", "nope")
    with pytest.raises(AuthError):
        auth.authenticate("ghost", "secret")


def test_disabled_auth_is_open():
    assert BasicAuthenticator({"enabled": False}).authenticate("x", "y") == []
    assert BasicAuthenticator(None).authenticate("x", "y") == []


def test_roles_feed_mcp_rbac(spark):
    """End-to-end: credentials -> roles -> tool RBAC filter."""
    import os

    from flapi_spark.config import EndpointConfig
    from flapi_spark.executor import QueryExecutor
    from flapi_spark.mcp import AuthorizationError, McpRegistry
    from flapi_spark.sources.registry import Connection, ConnectionRegistry

    sf = os.environ.get("FLAPI_SPARK_TEST_SF", "/root/testdata/sf0.001")
    reg = ConnectionRegistry()
    reg.add(Connection(name="c", properties={"path": os.path.join(sf, "customer.parquet")}))
    ep = EndpointConfig(
        url_path="/c/",
        template_text="SELECT count(*) AS n FROM parquet.`{{{conn.path}}}`",
        connections=["c"], with_pagination=False,
        auth=AUTH_BLOCK, allowed_roles=["ai_tools"],
    )
    registry = McpRegistry(QueryExecutor(spark, reg))
    registry.register("count_customers", ep)
    auth = BasicAuthenticator(ep.auth)

    roles = auth.authenticate("bot", "botpw")
    out = registry.call_tool("count_customers", {}, roles=roles)
    assert out["rows"][0]["n"] > 0

    admin_roles = auth.authenticate("admin", "secret")
    with pytest.raises(AuthorizationError):
        registry.call_tool("count_customers", {}, roles=admin_roles)
