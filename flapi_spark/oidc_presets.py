"""OIDC provider presets and discovery-document handling.

Reference parity:
- `oidc_provider_presets.cpp` — `provider:` shorthand in the auth
  config expands to the provider's issuer template, claim mappings and
  default scopes (google / microsoft / keycloak / auth0 / okta /
  github), leaving explicitly-set fields untouched.
- `oidc_discovery_client.cpp` — `.well-known/openid-configuration`
  parsing (issuer + jwks_uri required; endpoints optional) with a
  TTL'd metadata cache. Network IO is injected (`fetch`) so tests and
  offline deployments use static documents; nothing here imports
  requests/urllib.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field


@dataclass
class ProviderConfig:
    """Mutable provider settings a preset fills in (reference:
    OIDCConfig). Empty string/list means "not set by the user"."""

    provider_type: str = "generic"
    issuer_url: str = ""
    username_claim: str = ""
    email_claim: str = ""
    roles_claim: str = ""
    role_claim_path: str = ""
    groups_claim: str = ""
    scopes: list[str] = field(default_factory=list)


_OIDC_SCOPES = ["openid", "profile", "email"]

# provider -> (issuer template, username_claim, extra updates)
_PRESETS = {
    "google": dict(
        issuer="https://accounts.google.com",
        username_claim="email",
    ),
    "microsoft": dict(
        issuer="https://login.microsoftonline.com/{tenant}/v2.0",
        username_claim="preferred_username",
    ),
    "keycloak": dict(
        issuer="https://keycloak.example.com/realms/{realm}",
        username_claim="preferred_username",
        role_claim_path="realm_access.roles",
        groups_claim="groups",
    ),
    "auth0": dict(
        issuer="https://{domain}.auth0.com",
        username_claim="email",
        auth0_role_path=True,
    ),
    "okta": dict(
        issuer="https://{domain}.okta.com/oauth2/default",
        username_claim="preferred_username",
        groups_claim="groups",
    ),
    "github": dict(
        issuer="https://github.com",
        username_claim="login",
        scopes=["read:user", "user:email"],
    ),
}


def apply_preset(config: ProviderConfig) -> bool:
    """Fill provider defaults into `config` in place; returns whether a
    preset applied (generic/unknown -> False, issuer must be explicit).
    Mirrors reference semantics exactly: user-set fields win; issuer
    templates with `{placeholder}` are (re)installed until the user
    substitutes them; username_claim 'sub' counts as unset (the
    reference upgrades the unhelpful default)."""
    preset = _PRESETS.get(config.provider_type)
    if config.provider_type in ("", "generic") or preset is None:
        return False
    # the reference sets the issuer template only when unset; a
    # user-supplied issuer (even one still holding a {placeholder})
    # is left for the user to substitute
    if not config.issuer_url:
        config.issuer_url = preset["issuer"]
    if not config.username_claim or config.username_claim == "sub":
        config.username_claim = preset["username_claim"]
    if not config.email_claim:
        config.email_claim = "email"
    if preset.get("role_claim_path") and not config.role_claim_path:
        config.role_claim_path = preset["role_claim_path"]
    if preset.get("auth0_role_path") and not config.role_claim_path and not config.roles_claim:
        config.role_claim_path = "https://your-namespace/roles"
    if not config.roles_claim and not (
        preset.get("auth0_role_path") and config.role_claim_path
    ):
        config.roles_claim = "roles"
    if preset.get("groups_claim") and not config.groups_claim:
        config.groups_claim = preset["groups_claim"]
    if not config.scopes:
        config.scopes = list(preset.get("scopes", _OIDC_SCOPES))
    return True


def required_parameters(provider_type: str) -> str:
    """Human-readable setup notes per provider (reference:
    getRequiredParameters)."""
    notes = {
        "google": "Requires: client-id, allowed-audiences",
        "microsoft": "Requires: client-id, issuer-url with {tenant} placeholder",
        "keycloak": "Requires: client-id, issuer-url with {realm} placeholder",
        "auth0": "Requires: client-id, issuer-url with {domain} placeholder",
        "okta": "Requires: client-id, issuer-url with {domain} placeholder",
        "github": "Requires: client-id",
    }
    return notes.get(
        provider_type, "Generic OIDC: Requires issuer-url (discovery endpoint), client-id"
    )


@dataclass
class ProviderMetadata:
    """Parsed discovery document (reference: OIDCProviderMetadata)."""

    issuer: str
    jwks_uri: str
    authorization_endpoint: str = ""
    token_endpoint: str = ""
    userinfo_endpoint: str = ""


def discovery_url(issuer_url: str) -> str:
    """issuer -> its well-known discovery endpoint (trailing-slash
    normalized, reference: fetchDiscoveryDocument)."""
    base = issuer_url if issuer_url.endswith("/") else issuer_url + "/"
    return base + ".well-known/openid-configuration"


def parse_discovery_document(body: str) -> ProviderMetadata | None:
    """Parse a discovery JSON body; `issuer` and `jwks_uri` are
    mandatory (None on absence or malformed JSON — the caller treats
    the provider as unreachable, never crashes auth)."""
    try:
        doc = json.loads(body)
    except (ValueError, TypeError):
        return None
    if not isinstance(doc, dict):
        return None
    if not doc.get("issuer") or not doc.get("jwks_uri"):
        return None
    return ProviderMetadata(
        issuer=doc["issuer"],
        jwks_uri=doc["jwks_uri"],
        authorization_endpoint=doc.get("authorization_endpoint", ""),
        token_endpoint=doc.get("token_endpoint", ""),
        userinfo_endpoint=doc.get("userinfo_endpoint", ""),
    )


class DiscoveryClient:
    """TTL-cached discovery metadata lookups. `fetch(url) -> str|None`
    is injected — a static fixture in tests, an HTTP client in a
    deployment that allows egress."""

    def __init__(self, fetch, cache_ttl_s: int = 86400, clock=time.monotonic):
        self._fetch = fetch
        self._ttl = cache_ttl_s
        self._clock = clock
        self._cache: dict[str, tuple[float, ProviderMetadata]] = {}

    def set_cache_ttl(self, ttl_s: int) -> None:
        self._ttl = ttl_s

    def get_metadata(self, issuer_url: str) -> ProviderMetadata | None:
        now = self._clock()
        hit = self._cache.get(issuer_url)
        if hit is not None and now - hit[0] < self._ttl:
            return hit[1]
        body = self._fetch(discovery_url(issuer_url))
        if body is None:
            return None
        meta = parse_discovery_document(body)
        if meta is None:
            return None
        self._cache[issuer_url] = (now, meta)
        return meta

    def clear_cache(self) -> None:
        self._cache.clear()
