"""Configuration security auditor.

Parity with the reference's auditor (reference: src/security_auditor.cpp
— classify stored passwords, flag MD5/plaintext, warn when MCP tools
are exposed without authentication), extended with two Spark-engine
checks the reference doesn't need: raw `{{{params.*}}}` interpolation
sites without an injection screen, and endpoints that can materialize
unbounded results on the driver.

Warnings are (code, message, location) records; run it in CI or at
service start and fail deployment on a non-empty list.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from flapi_spark.config import EndpointConfig


@dataclass
class SecurityWarning:
    code: str
    message: str
    location: str


_HEX32 = re.compile(r"^[0-9a-fA-F]{32}$")
_RAW_PARAM = re.compile(r"\{\{\{\s*params\.([\w.\-]+)\s*\}\}\}")


def classify_password(password: str) -> str:
    """'' = acceptable (hashed with a modern KDF); else a warning code
    (reference: SecurityAuditor::classifyPassword, with the repo's
    passlib-pbkdf2 format added to the acceptable set)."""
    if not password:
        return ""
    if password.startswith("$pbkdf2-sha256$"):
        return ""
    if (
        len(password) >= 4
        and password[0] == "$"
        and password[1] == "2"
        and password[3] == "$"
        and password[2] in "aby"
    ):
        return ""  # bcrypt
    if _HEX32.match(password):
        return "AUTH_MD5_PASSWORD"
    return "AUTH_PLAINTEXT_PASSWORD"


def _scan_users(users: list[dict], location: str, out: list[SecurityWarning]) -> None:
    for u in users or []:
        name = str(u.get("username", "?"))
        code = classify_password(str(u.get("password", "")))
        if code == "AUTH_PLAINTEXT_PASSWORD":
            out.append(SecurityWarning(
                code,
                f"User '{name}' has a plaintext password; store a"
                " pbkdf2/bcrypt hash instead (flapi_spark.auth.hash_password).",
                location,
            ))
        elif code == "AUTH_MD5_PASSWORD":
            out.append(SecurityWarning(
                code,
                f"User '{name}' has an MD5-hashed password; MD5 is"
                " cryptographically broken — migrate to pbkdf2/bcrypt.",
                location,
            ))


def audit(
    endpoints: list[EndpointConfig],
    mcp_auth_enabled: bool | None = None,
    mcp_users: list[dict] | None = None,
) -> list[SecurityWarning]:
    """Audit endpoint configs (+ optional MCP auth state) and return
    every security warning found."""
    warnings: list[SecurityWarning] = []
    for ep in endpoints:
        loc = f"endpoint {ep.url_path or '<unnamed>'}"
        _scan_users((ep.auth or {}).get("users", []), loc, warnings)

        # raw interpolation without an injection screen: a {{{params.x}}}
        # site splices unescaped text into SQL; require the field to
        # carry preventSqlInjection (or be absent from request fields —
        # then it can never be caller-supplied)
        template = ep.template_text or ""
        screened = {
            f.field_name
            for f in ep.request_fields
            if any(getattr(v, "prevent_sql_injection", False) for v in f.validators)
        }
        declared = {f.field_name for f in ep.request_fields}
        for m in _RAW_PARAM.finditer(template):
            pname = m.group(1)
            if pname in declared and pname not in screened:
                warnings.append(SecurityWarning(
                    "RAW_PARAM_INTERPOLATION",
                    f"Parameter '{pname}' is interpolated raw"
                    " ({{{params.*}}}) without a preventSqlInjection"
                    " validator — caller text reaches the SQL string"
                    " unescaped.",
                    loc,
                ))

        # write endpoint without auth: anonymous callers can mutate
        # the warehouse — the highest-impact misconfiguration a write
        # surface adds
        if ep.is_write and not (ep.auth or {}).get("enabled"):
            warnings.append(SecurityWarning(
                "UNAUTHENTICATED_WRITE",
                "Write endpoint has no auth block; anonymous callers"
                " can mutate data. Enable auth or restrict roles.",
                loc,
            ))
        # write endpoint with an unbounded method-to-operation drift:
        # operation.type read on POST/PUT/PATCH/DELETE means the read
        # path executes DML eagerly on describe/dry-run
        if (
            ep.method in ("POST", "PUT", "PATCH", "DELETE")
            and not ep.is_write
        ):
            warnings.append(SecurityWarning(
                "WRITE_METHOD_READ_OPERATION",
                f"Method {ep.method} with operation.type read: the"
                " read path would execute template DML eagerly during"
                " schema probing. Set operation.type: write.",
                loc,
            ))

        # unbounded endpoint: no pagination and no shape cap means a
        # full-result driver materialization at serialization time
        if not ep.with_pagination and not (ep.shape and ep.shape.max_rows):
            warnings.append(SecurityWarning(
                "UNBOUNDED_ENDPOINT",
                "Endpoint has neither pagination nor a shape max-rows"
                " cap; serialization falls back to the library default"
                " row cap only.",
                loc,
            ))

    if mcp_auth_enabled is False:
        _scan_users(mcp_users or [], "mcp.auth", warnings)
        if endpoints:
            warnings.append(SecurityWarning(
                "MCP_UNAUTHENTICATED_TOOLS",
                "MCP tools are exposed without authentication"
                " (auth_enabled is false): anyone reaching the registry"
                " can invoke any tool. Enable fail-closed auth"
                " (McpRegistry(auth_enabled=True)) and configure"
                " allowed-roles.",
                "mcp",
            ))
    elif mcp_users:
        _scan_users(mcp_users, "mcp.auth", warnings)
    return warnings
