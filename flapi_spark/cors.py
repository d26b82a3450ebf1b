"""CORS policy semantics (reference: cors_policy.cpp,
cors_middleware.cpp, config_manager.cpp parseCorsConfig).

HTTP plumbing is out of scope for the Spark engine, but the POLICY —
which origin value (if any) a response may echo back, given the
project's `cors:` allowlist — is pure semantics the reference tests
exhaustively (test/cpp/cors_policy_test.cpp). Re-expressed here as a
pure function plus the response-header application step, so an HTTP
layer put in front of QueryExecutor inherits identical behavior.
"""

from __future__ import annotations

from dataclasses import dataclass, field

WILDCARD = "*"


@dataclass
class CorsConfig:
    """The reference's `cors:` project block (allow-origins /
    allow-headers / allow-methods), YAML keys verbatim."""

    allow_origins: list[str] = field(default_factory=list)
    allow_headers: list[str] = field(default_factory=list)
    allow_methods: list[str] = field(default_factory=list)

    @classmethod
    def from_dict(cls, raw: dict | None) -> "CorsConfig":
        # absent block → empty allowlist → wildcard default, the
        # reference's "simple stays simple" promise
        raw = raw or {}
        return cls(
            allow_origins=list(raw.get("allow-origins") or []),
            allow_headers=list(raw.get("allow-headers") or []),
            allow_methods=list(raw.get("allow-methods") or []),
        )


def resolve_allowed_origin(
    request_origin: str, allow_origins: list[str]
) -> str | None:
    """The reference's CorsPolicy::resolveAllowedOrigin, rule for rule:

    1. empty allowlist → "*" (historic default; unconfigured projects
       keep working from a browser);
    2. explicit "*" anywhere in the list wins, even mixed with
       concrete entries;
    3. no Origin header (same-origin / curl) → None — no CORS header
       is emitted and none is needed;
    4. exact, case-sensitive match → echo the origin back;
    5. anything else → None (browser blocks cross-origin access; a
       non-allowlisted origin must NOT see "*" echoed back).
    """
    if not allow_origins:
        return WILDCARD
    if WILDCARD in allow_origins:
        return WILDCARD
    if not request_origin:
        return None
    if request_origin in allow_origins:
        return request_origin
    return None


def cors_response_headers(
    request_origin: str, cfg: CorsConfig, preflight: bool = False
) -> dict[str, str]:
    """Headers to attach to a response (after_handle in the reference
    middleware): the resolved Allow-Origin, plus — on preflight
    requests — the configured allow-methods / allow-headers lists."""
    resolved = resolve_allowed_origin(request_origin, cfg.allow_origins)
    if resolved is None:
        return {}
    headers = {"Access-Control-Allow-Origin": resolved}
    if preflight:
        if cfg.allow_methods:
            headers["Access-Control-Allow-Methods"] = ", ".join(
                cfg.allow_methods
            )
        if cfg.allow_headers:
            headers["Access-Control-Allow-Headers"] = ", ".join(
                cfg.allow_headers
            )
    return headers
