"""Security auditor (reference: security_auditor.cpp + Spark-specific
raw-interpolation and unbounded-endpoint checks)."""
from flapi_spark.auth import hash_password
from flapi_spark.config import EndpointConfig, ShapeConfig
from flapi_spark.security_auditor import audit, classify_password
from flapi_spark.validation import RequestField, Validator


def test_classify_password_reference_matrix():
    assert classify_password("") == ""
    assert classify_password(hash_password("x")) == ""
    assert classify_password("$2b$12$abcdefghijk") == ""  # bcrypt
    assert classify_password("d41d8cd98f00b204e9800998ecf8427e") == "AUTH_MD5_PASSWORD"
    assert classify_password("hunter2") == "AUTH_PLAINTEXT_PASSWORD"


def _ep(**over):
    base = dict(
        url_path="/x/",
        template_text="SELECT 1",
        with_pagination=True,
    )
    base.update(over)
    return EndpointConfig(**base)


def test_plaintext_and_md5_users_flagged():
    ep = _ep(auth={"enabled": True, "users": [
        {"username": "a", "password": "plain"},
        {"username": "b", "password": "d41d8cd98f00b204e9800998ecf8427e"},
        {"username": "c", "password": hash_password("ok")},
    ]})
    codes = [w.code for w in audit([ep])]
    assert codes.count("AUTH_PLAINTEXT_PASSWORD") == 1
    assert codes.count("AUTH_MD5_PASSWORD") == 1


def test_raw_interpolation_without_screen_flagged():
    tpl = "SELECT * FROM t WHERE c = '{{{params.seg}}}' AND d = {{params.other}}"
    fields = [RequestField(field_name="seg", validators=[Validator(type="string")])]
    ep = _ep(template_text=tpl, request_fields=fields)
    codes = [w.code for w in audit([ep])]
    assert "RAW_PARAM_INTERPOLATION" in codes
    # with the injection screen the warning goes away
    screened = [RequestField(field_name="seg", validators=[
        Validator(type="string", prevent_sql_injection=True)])]
    ep2 = _ep(template_text=tpl, request_fields=screened)
    assert "RAW_PARAM_INTERPOLATION" not in [w.code for w in audit([ep2])]


def test_unbounded_endpoint_flagged():
    assert "UNBOUNDED_ENDPOINT" in [
        w.code for w in audit([_ep(with_pagination=False)])]
    assert "UNBOUNDED_ENDPOINT" not in [
        w.code for w in audit([_ep(with_pagination=True)])]
    capped = _ep(with_pagination=False, shape=ShapeConfig(max_rows=100))
    assert "UNBOUNDED_ENDPOINT" not in [w.code for w in audit([capped])]


def test_mcp_unauthenticated_tools_flagged():
    eps = [_ep()]
    assert "MCP_UNAUTHENTICATED_TOOLS" in [
        w.code for w in audit(eps, mcp_auth_enabled=False)]
    assert "MCP_UNAUTHENTICATED_TOOLS" not in [
        w.code for w in audit(eps, mcp_auth_enabled=True)]
    assert "MCP_UNAUTHENTICATED_TOOLS" not in [
        w.code for w in audit(eps)]  # MCP state unknown -> no claim


def test_write_endpoints_flagged_without_auth():
    from flapi_spark.config import EndpointConfig
    from flapi_spark.security_auditor import audit

    noauth = EndpointConfig.from_dict({
        "url-path": "/w", "method": "POST",
        "template-text": "INSERT INTO t VALUES (1)",
    })
    codes = [w.code for w in audit([noauth])]
    assert "UNAUTHENTICATED_WRITE" in codes
    authed = EndpointConfig.from_dict({
        "url-path": "/w2", "method": "POST",
        "template-text": "INSERT INTO t VALUES (1)",
        "auth": {"enabled": True, "users": []},
    })
    codes2 = [w.code for w in audit([authed])]
    assert "UNAUTHENTICATED_WRITE" not in codes2
    drift = EndpointConfig.from_dict({
        "url-path": "/w3", "method": "POST",
        "operation": {"type": "read"},
        "template-text": "INSERT INTO t VALUES (1)",
    })
    codes3 = [w.code for w in audit([drift])]
    assert "WRITE_METHOD_READ_OPERATION" in codes3
