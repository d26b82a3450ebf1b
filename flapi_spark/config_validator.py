"""Endpoint / project config validation with helpful error messages.

Parity with the reference's config validation layer (reference:
config_validator.cpp, config_manager_yaml_validation_test.cpp): a
loaded config either passes or yields a list of human-readable errors
pointing at the offending field — surfaced before any query runs.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from flapi_spark.cache import _DURATION_RE
from flapi_spark.config import EndpointConfig

_VALIDATOR_TYPES = {
    "int", "integer", "double", "float", "boolean", "bool", "date",
    "time", "uuid", "email", "enum", "string",
}


@dataclass
class ValidationResult:
    valid: bool = True
    errors: list[str] = field(default_factory=list)
    warnings: list[str] = field(default_factory=list)

    def error(self, msg: str) -> None:
        self.valid = False
        self.errors.append(msg)


def validate_endpoint(ep: EndpointConfig, known_connections: set[str] | None = None) -> ValidationResult:
    res = ValidationResult()
    where = ep.url_path or "<endpoint>"

    if not ep.url_path:
        res.error("endpoint: 'url-path' is required")
    elif not ep.url_path.startswith("/"):
        res.error(f"{where}: 'url-path' must start with '/'")

    if not ep.template_source and ep.template_text is None:
        res.error(f"{where}: one of 'template-source' or 'template-text' is required")

    if ep.method not in ("GET", "POST", "PUT", "PATCH", "DELETE"):
        res.error(f"{where}: unknown method '{ep.method}'")
    if (
        ep.is_write
        and ep.cache.enabled
        and ep.cache.refresh_on_write
        and not ep.cache.template_file
    ):
        res.error(
            f"{where}: refresh-on-write on a write endpoint requires"
            " cache.template-file (the endpoint template is the"
            " mutation, not the cacheable read)"
        )

    if known_connections is not None:
        for c in ep.connections:
            if c not in known_connections:
                res.error(f"{where}: unknown connection '{c}'")

    seen = set()
    for f in ep.request_fields:
        if not f.field_name:
            res.error(f"{where}: request field without 'field-name'")
            continue
        if f.field_name in seen:
            res.error(f"{where}: duplicate request field '{f.field_name}'")
        seen.add(f.field_name)
        if f.field_in not in ("query", "path", "body", "header"):
            res.error(
                f"{where}.{f.field_name}: bad 'field-in' '{f.field_in}'"
                " (query|path|body|header)"
            )
        for v in f.validators:
            if v.type not in _VALIDATOR_TYPES:
                res.error(
                    f"{where}.{f.field_name}: unknown validator type '{v.type}'"
                )
            if v.type == "enum" and not v.allowed_values:
                res.error(
                    f"{where}.{f.field_name}: enum validator needs 'allowedValues'"
                )
            if v.min is not None and v.max is not None:
                try:
                    if float(v.min) > float(v.max):
                        res.error(
                            f"{where}.{f.field_name}: min {v.min} > max {v.max}"
                        )
                except (TypeError, ValueError):
                    pass  # date strings etc. — typed validators check these

    cache = ep.cache
    if cache.enabled:
        if not cache.table:
            res.error(f"{where}: cache.enabled requires cache.table")
        for label, dur in (("schedule", cache.schedule),
                           ("retention.max-snapshot-age", cache.max_snapshot_age)):
            if dur is not None and not _DURATION_RE.match(str(dur).strip()):
                res.error(
                    f"{where}: cache.{label} '{dur}' is not a duration"
                    " (e.g. 30s, 5m, 2h, 7d)"
                )
        if cache.cursor_column and not cache.primary_key:
            res.warnings.append(
                f"{where}: cursor without primary-key appends instead of merging"
            )
        if cache.keep_last_snapshots is not None and cache.keep_last_snapshots < 1:
            res.error(f"{where}: retention.keep-last-snapshots must be >= 1")

    if ep.rate_limit.get("enabled"):
        if int(ep.rate_limit.get("max", 0) or 0) <= 0:
            res.error(f"{where}: rate-limit.max must be a positive integer")
        if float(ep.rate_limit.get("interval", 0) or 0) <= 0:
            res.error(f"{where}: rate-limit.interval must be positive seconds")

    return res


def validate_endpoints(
    endpoints: list[EndpointConfig], known_connections: set[str] | None = None
) -> ValidationResult:
    """Aggregate validation incl. cross-endpoint checks (duplicate
    url-paths shadow each other in the route table)."""
    total = ValidationResult()
    seen_paths: set[str] = set()
    for ep in endpoints:
        r = validate_endpoint(ep, known_connections)
        total.errors.extend(r.errors)
        total.warnings.extend(r.warnings)
        total.valid = total.valid and r.valid
        if ep.url_path:
            if ep.url_path in seen_paths:
                total.error(f"duplicate url-path '{ep.url_path}'")
            seen_paths.add(ep.url_path)
    return total


class ConfigurationError(ValueError):
    """Project-config semantic error (reference: ConfigurationError in
    config_manager.cpp — carries the offending config path)."""

    def __init__(self, message: str, config_path: str = ""):
        super().__init__(message)
        self.config_path = config_path


@dataclass
class HttpsConfig:
    """Parsed `enforce-https` block of the project flapi.yaml
    (reference: config_manager.cpp parseHttpsConfig +
    test/cpp/https_config_test.cpp). The TLS listener itself is out of
    scope for a query engine; the config SEMANTICS are not — a bundle
    validated here deploys unchanged against the reference server."""

    enabled: bool = False
    ssl_cert_file: str = ""
    ssl_key_file: str = ""


def parse_https_config(
    project_doc: dict, check_files: bool = False
) -> HttpsConfig:
    """Mirror of the reference's parseHttpsConfig semantics
    (config_manager.cpp:1062-1078, vectors in https_config_test.cpp):

    - absent `enforce-https` -> disabled, empty paths
    - `enforce-https` not a map -> ConfigurationError
    - enabled: false -> disabled; cert/key NOT required and not kept
    - enabled: true -> BOTH ssl-cert-file and ssl-key-file keys
      required, else ConfigurationError
    - `check_files=True` additionally requires both paths to exist
      (the reference defers that to the TLS listener at bind time;
      opt-in here so `flapi validate` can fail fast pre-deploy)
    """
    node = (project_doc or {}).get("enforce-https")
    if node is None:
        return HttpsConfig()
    if not isinstance(node, dict):
        raise ConfigurationError(
            "'enforce-https' must be a map", "enforce-https"
        )
    enabled = bool(node.get("enabled", False))
    if not enabled:
        return HttpsConfig(enabled=False)
    cert = str(node.get("ssl-cert-file") or "")
    key = str(node.get("ssl-key-file") or "")
    if not cert or not key:
        raise ConfigurationError(
            "SSL certificate and key files must be specified when"
            " HTTPS is enabled",
            "enforce-https",
        )
    if check_files:
        from pathlib import Path

        for label, p in (("ssl-cert-file", cert), ("ssl-key-file", key)):
            if not Path(p).is_file():
                raise ConfigurationError(
                    f"{label} does not exist: {p}",
                    f"enforce-https.{label}",
                )
    return HttpsConfig(enabled=True, ssl_cert_file=cert, ssl_key_file=key)
