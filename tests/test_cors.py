"""CORS policy semantics — mirrors the reference's
test/cpp/cors_policy_test.cpp case list one for one."""

from flapi_spark.cors import (
    WILDCARD,
    CorsConfig,
    cors_response_headers,
    resolve_allowed_origin,
)


def test_empty_allowlist_preserves_wildcard():
    assert resolve_allowed_origin("https://a.example", []) == WILDCARD
    assert resolve_allowed_origin("", []) == WILDCARD


def test_wildcard_token_in_allowlist_returns_wildcard():
    assert resolve_allowed_origin("https://a.example", ["*"]) == WILDCARD


def test_exact_origin_match_is_echoed_back():
    allow = ["https://app.example.com", "https://b.example"]
    assert (
        resolve_allowed_origin("https://app.example.com", allow)
        == "https://app.example.com"
    )


def test_non_matching_origin_yields_none():
    assert resolve_allowed_origin(
        "https://evil.example", ["https://app.example.com"]
    ) is None


def test_empty_request_origin_with_non_wildcard_allowlist_yields_none():
    assert resolve_allowed_origin("", ["https://app.example.com"]) is None


def test_empty_request_origin_with_wildcard_allowlist_returns_wildcard():
    assert resolve_allowed_origin("", ["*"]) == WILDCARD


def test_origin_match_is_case_sensitive():
    assert resolve_allowed_origin(
        "https://App.Example.Com", ["https://app.example.com"]
    ) is None


def test_wildcard_mixed_with_explicit_entries_collapses_to_wildcard():
    assert (
        resolve_allowed_origin(
            "https://app.example.com", ["https://app.example.com", "*"]
        )
        == WILDCARD
    )


def test_config_from_dict_defaults_and_parsing():
    assert CorsConfig.from_dict(None).allow_origins == []
    cfg = CorsConfig.from_dict(
        {
            "allow-origins": ["https://app.example.com"],
            "allow-methods": ["GET", "POST"],
            "allow-headers": ["Authorization"],
        }
    )
    assert cfg.allow_origins == ["https://app.example.com"]
    assert cfg.allow_methods == ["GET", "POST"]


def test_response_headers_simple_and_preflight():
    cfg = CorsConfig.from_dict(
        {
            "allow-origins": ["https://app.example.com"],
            "allow-methods": ["GET", "POST"],
            "allow-headers": ["Authorization", "Content-Type"],
        }
    )
    # non-allowlisted origin: NO headers (must not leak "*")
    assert cors_response_headers("https://evil.example", cfg) == {}
    # simple request: origin echo only
    assert cors_response_headers("https://app.example.com", cfg) == {
        "Access-Control-Allow-Origin": "https://app.example.com"
    }
    # preflight: methods + headers lists attached
    got = cors_response_headers(
        "https://app.example.com", cfg, preflight=True
    )
    assert got["Access-Control-Allow-Methods"] == "GET, POST"
    assert got["Access-Control-Allow-Headers"] == "Authorization, Content-Type"
